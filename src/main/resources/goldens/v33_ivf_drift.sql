SELECT * FROM (VALUES
           (CAST(990 AS BIGINT), CAST(16 AS BIGINT), CAST(73 AS BIGINT), CAST(61.88 AS DOUBLE), CAST(1.18 AS DOUBLE)))
         AS t("n_postings", "n_live_cells", "max_occ", "mean_occ", "occ_skew")
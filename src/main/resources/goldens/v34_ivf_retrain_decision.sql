SELECT * FROM (VALUES
           ('drifted', CAST(4990 AS BIGINT), CAST(16 AS BIGINT), CAST(2065 AS BIGINT), CAST(311.88 AS DOUBLE), CAST(6.62 AS DOUBLE), CAST(4.0 AS DOUBLE), True, 'retrain+reassign'),
           ('healthy', CAST(990 AS BIGINT), CAST(16 AS BIGINT), CAST(73 AS BIGINT), CAST(61.88 AS DOUBLE), CAST(1.18 AS DOUBLE), CAST(4.0 AS DOUBLE), False, 'none'))
         AS t("state", "n_postings", "n_live_cells", "max_occ", "mean_occ", "occ_skew", "threshold", "retrain", "action") ORDER BY "state"
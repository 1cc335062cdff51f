SELECT * FROM (VALUES
           (CAST(4 AS BIGINT), CAST(6 AS BIGINT), CAST(1.0 AS DOUBLE)))
         AS t("recall_band", "n_queries", "mean_recall")
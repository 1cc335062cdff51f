SELECT * FROM (VALUES
           ('bm25', CAST(32 AS BIGINT), CAST(23 AS BIGINT), CAST(0.446875 AS DOUBLE)),
           ('dense', CAST(32 AS BIGINT), CAST(24 AS BIGINT), CAST(0.413108 AS DOUBLE)),
           ('dense_ivf', CAST(32 AS BIGINT), CAST(24 AS BIGINT), CAST(0.413108 AS DOUBLE)),
           ('hybrid_bounded', CAST(32 AS BIGINT), CAST(24 AS BIGINT), CAST(0.567708 AS DOUBLE)),
           ('hybrid_rrf', CAST(32 AS BIGINT), CAST(24 AS BIGINT), CAST(0.552083 AS DOUBLE)))
         AS t("method", "n_queries", "n_hits", "mrr")
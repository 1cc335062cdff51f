SELECT * FROM (VALUES
           ('pruned_2of4', CAST(495 AS BIGINT), CAST(444 AS BIGINT), CAST(0.89697 AS DOUBLE)),
           ('unpruned', CAST(495 AS BIGINT), CAST(495 AS BIGINT), CAST(1.0 AS DOUBLE)))
         AS t("mode", "n_vecs", "n_agree", "agree_rate")
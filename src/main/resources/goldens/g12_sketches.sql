SELECT * FROM (VALUES
           ('A', CAST(11114 AS BIGINT), CAST(1947 AS BIGINT), CAST(52817.85 AS DOUBLE)),
           ('N', CAST(10109 AS BIGINT), CAST(1947 AS BIGINT), CAST(52988.65 AS DOUBLE)),
           ('R', CAST(11377 AS BIGINT), CAST(1947 AS BIGINT), CAST(53157.64 AS DOUBLE)))
         AS t("l_returnflag", "approx_orders", "approx_parts", "median_price_approx")
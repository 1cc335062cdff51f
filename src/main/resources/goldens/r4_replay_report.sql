SELECT * FROM (VALUES
           (CAST(124 AS BIGINT), CAST(446.937758 AS DOUBLE), CAST(2050 AS BIGINT), CAST(29.491286 AS DOUBLE), 55, CAST(455.736675 AS DOUBLE), CAST(0.9 AS DOUBLE), CAST(749 AS BIGINT), 41))
         AS t(brk_n_trades, brk_total_pct, intra_n_trades, total_roi_pct, days, annualized_pct, profitable_share, panel_rows, panel_cols)
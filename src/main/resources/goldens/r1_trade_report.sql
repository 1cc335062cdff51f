SELECT * FROM (VALUES
           (CAST(107 AS BIGINT), CAST(0.299065 AS DOUBLE), CAST(0.41443272 AS DOUBLE), CAST(-0.35283652 AS DOUBLE), CAST(0.0 AS DOUBLE)))
         AS t(n_trades, win_rate, avg_profit, avg_loss, mc_loss_share)
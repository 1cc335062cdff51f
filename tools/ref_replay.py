#!/usr/bin/env python3
"""Independent single-threaded oracle for the reference's two end-to-end
pipelines (SURVEY.md §3.1 / §3.2), run against the committed reference-shaped
fixture (src/test/resources/reffix) to produce frozen goldens that the Spark
replay chain (queries/ReplayQ.scala) must reproduce EXACTLY.

This is a from-scratch reimplementation of the published semantics
(stock_arbitrage.ipynb cells 1-8; intra_day_arbitrage.ipynb cells 4-8/16/27
and IntradayRegionArbitrage.py), NOT a copy of the reference code. It keeps
the same two sanctioned divergences as the Scala engine (SURVEY §7.4):
market-close and stop-loss iteration walk a snapshot of open positions, and
trading days group chronologically (real date) instead of pandas day-of-month.

Usage: python3 tools/ref_replay.py [fixture_dir]
Writes goldens under <fixture_dir>/goldens/.
"""
import json
import math
import os
import sys

import numpy as np
import pandas as pd

FIX = sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/reffix"
OUT = os.path.join(FIX, "goldens")
os.makedirs(OUT, exist_ok=True)

EXCHANGES = ["NMS", "NYQ", "GER", "FRA", "BER", "DUS", "ISE"]


# --------------------------------------------------------------------------
# §3.1 — BRK share-class chain (stock_arbitrage.ipynb top-to-bottom)
# --------------------------------------------------------------------------
def brk_chain():
    ratio, buy_at, fees = 1500, 0.005, 0.0
    daily = pd.read_parquet(os.path.join(FIX, "quotes_daily.parquet"))
    a1 = daily[daily.ticker == "BRK-A"].set_index("ts").sort_index()["close"]
    a2 = daily[daily.ticker == "BRK-B"].set_index("ts").sort_index()["close"] * ratio

    delta = (a2 - a1) / a2
    shares = {p: float((delta.abs() >= p).sum() / len(delta) * 100)
              for p in (0.005, 0.01)}

    r2 = np.log(1 + a2.pct_change())
    r1 = np.log(1 + a1.pct_change())
    frame = pd.DataFrame({"delta": delta, "r1": r1, "r2": r2}).dropna() \
        .replace([np.inf, -np.inf], 0.0)

    # state machine: arm on |delta| >= buy_at, open at the NEXT bar, close
    # when sign*delta <= 0 with INCLUSIVE [open..close] label-slice sums
    trades = []
    in_arb = False
    pending = False
    sign = 0.0
    cum1 = cum2 = 0.0
    open_ts = None
    open_cum1 = open_cum2 = 0.0
    for ts, row in frame.iterrows():
        if pending:
            open_ts, open_cum1, open_cum2 = ts, cum1, cum2
            in_arb, pending = True, False
        cum1 += row.r1
        cum2 += row.r2
        if in_arb:
            if sign * row.delta <= 0.0:
                ret = -sign * (cum2 - open_cum2) + sign * (cum1 - open_cum1) - fees
                trades.append((open_ts, ts, ret))
                in_arb = False
        elif not pending and abs(row.delta) >= buy_at:
            sign = float(np.sign(row.delta))
            pending = True

    total = float(np.prod([math.exp(t[2]) for t in trades]) * 100)
    tdf = pd.DataFrame(trades, columns=["open_ts", "close_ts", "ret"])
    tdf["ret"] = tdf["ret"].round(9)
    tdf.to_parquet(os.path.join(OUT, "brk_trades.parquet"), index=False,
                   coerce_timestamps="us", allow_truncated_timestamps=True)
    return {"n_trades": len(trades), "total_return_pct": round(total, 6),
            "share_0p5": round(shares[0.005], 9), "share_1p0": round(shares[0.01], 9)}


# --------------------------------------------------------------------------
# §3.3 — the per-tick engine (IntradayRegionArbitrage.py semantics,
# snapshot-iteration divergences as in the Scala twin)
# --------------------------------------------------------------------------
class Engine:
    CLOSE_CUTOFF = 16 * 3600 + 29 * 60  # strictly after 16:29:00

    def __init__(self, bal, min_dev, sl, trig, size, size_pct):
        self.balance = bal
        self.min_dev, self.sl, self.trig = min_dev, sl, trig
        self.size, self.size_pct = size, size_pct
        self.shares, self.base_shares = {}, {}
        self.cpt = []
        self.base_price = 0.0
        self.prices = []

    def data_feed(self, sec_of_day, returns, price_data, out):
        self.base_price = price_data[0]
        self.prices = price_data[1:]
        closing = sec_of_day > self.CLOSE_CUTOFF
        if self.cpt:
            self.price_check(returns, out)
            if closing:
                for i in list(self.cpt):  # snapshot (sanctioned divergence)
                    self.close_trade(i, "mc", out)
        elif not closing:
            self.cpt = [i for i in range(len(returns)) if returns[i] > self.min_dev]
            if self.cpt:
                self.trade_signal(returns)

    def trade_signal(self, returns):
        order = (self.size * self.balance if self.size_pct else self.size) \
            / len(self.cpt) * 2
        for idx in self.cpt:
            price = self.prices[idx]
            lng = returns[idx] > 0
            self.shares[idx] = order / price * (1 if lng else -1)
            self.base_shares[idx] = order / self.base_price * (-1 if lng else 1)
            self.balance += self.shares[idx] * price
            self.balance += self.base_shares[idx] * self.base_price

    def price_check(self, returns, out):
        broke = False
        for i in list(self.cpt):  # snapshot (sanctioned divergence)
            if not broke and i in self.cpt:
                if -self.trig <= returns[i] <= self.trig:
                    self.close_trade(i, "tp", out)
                    broke = True  # reference `break`: nothing else this tick
                else:
                    pnl = (self.balance + self.base_shares[i] * self.base_price * -1
                           + self.shares[i] * self.prices[i] * -1) / self.balance - 1
                    if pnl < -self.sl:
                        self.close_trade(i, "sl", out)

    def close_trade(self, idx, kind, out):
        tmp = self.balance
        self.balance += self.base_shares[idx] * self.base_price * -1 \
            + self.shares[idx] * self.prices[idx] * -1
        roi = self.balance / tmp - 1
        del self.shares[idx]
        del self.base_shares[idx]
        self.cpt.remove(idx)
        out.append((kind, roi))


# --------------------------------------------------------------------------
# §3.2 — full intraday chain
# --------------------------------------------------------------------------
def intraday_chain():
    dim = pd.read_parquet(os.path.join(FIX, "stocks_dim.parquet"))
    quotes = pd.read_parquet(os.path.join(FIX, "quotes_5m.parquet"))
    fx = pd.read_parquet(os.path.join(FIX, "fx_5m.parquet")) \
        .set_index("ts").sort_index()["rate"]
    blocks = [("2022-12-01", "2022-12-08"), ("2022-12-12", "2022-12-19"),
              ("2022-12-21", "2022-12-28"), ("2022-12-30", "2023-01-06"),
              ("2023-01-10", "2023-01-17"), ("2023-01-19", "2023-01-26")]

    by_ticker = {t: g.set_index("ts").sort_index()["close"]
                 for t, g in quotes.groupby("ticker")}

    trades_out = []       # (company_id, ts, kind, roi)
    bal_series = {}       # company_id -> pd.Series(balance, index=ts)
    dim = dim[dim.Company != "Fujitsu"]  # P3 drop (intra.ipynb:1053)
    for _, row in dim.iterrows():
        lst = [row[e] for e in EXCHANGES if pd.notna(row[e])]
        if not (len(lst) > 1 and any("." in t for t in lst)):
            continue
        cid = int(row.Company[4:])  # Comp%02d -> dense id (eligible rows only)
        eng = Engine(1000.0, 0.1, 0.03, 0.01, 0.1, True)  # one trader/company
        hist = []
        for b0, b1 in blocks:
            cols = {}
            for t in lst:
                s = by_ticker.get(t)
                s = s[(s.index >= b0) & (s.index < b1)] if s is not None else None
                cols[t] = s if s is not None else pd.Series(dtype=float)
            price_df = pd.concat(cols, axis=1)        # union-grid outer align
            price_df = price_df.reindex(columns=lst)  # dropna column order
            rate = fx.reindex(price_df.index).ffill() # A3 reindex, NOT as-of
            conv = [t for t in lst if "." in t]
            price_conv = price_df.copy()
            price_conv[conv] = price_conv[conv].multiply(rate, axis=0)
            ret_df = (price_df - price_df.min()) / (price_df.max() - price_df.min())
            price_conv = price_conv.ffill()           # block-wide ffill
            ret_df = ret_df.ffill()
            mod = price_conv.index.hour * 60 + price_conv.index.minute
            session = (mod >= 870) & (mod <= 990)     # 14:30-16:30 inclusive
            price_s, ret_s = price_conv[session], ret_df[session]
            for _, day_idx in ret_s.groupby(ret_s.index.date).groups.items():
                day_ret = ret_s.loc[day_idx]
                base = day_ret.iloc[:, 0].ffill()
                diff = day_ret.iloc[:, 1:].div(base, axis=0) - 1
                day_price = price_s.loc[day_idx]
                for ts in day_ret.index:
                    sec = ts.hour * 3600 + ts.minute * 60 + ts.second
                    out = []
                    eng.data_feed(sec, diff.loc[ts].tolist(),
                                  day_price.loc[ts].tolist(), out)
                    for kind, roi in out:
                        trades_out.append((cid, ts, kind, roi))
                    hist.append((ts, eng.balance))
        bal_series[cid] = pd.Series(dict(hist))

    tdf = pd.DataFrame(trades_out, columns=["company", "ts", "kind", "roi"])
    tdf["roi"] = tdf["roi"].round(9)
    tdf = tdf.sort_values(["company", "ts", "kind"]).reset_index(drop=True)
    tdf.to_parquet(os.path.join(OUT, "intraday_trades.parquet"), index=False,
                   coerce_timestamps="us", allow_truncated_timestamps=True)

    # reporting (intra.ipynb cells 24/25/27): concat -> ffill -> drop first
    # row -> TOTAL row-sum; ROI on TOTAL; profitable = final > initial
    panel = pd.concat(bal_series, axis=1).ffill().iloc[1:]
    panel["TOTAL"] = panel.sum(axis=1)
    days = (panel.index[-1] - panel.index[0]).days
    roi = panel.iloc[-1, -1] / panel.iloc[0, -1] - 1
    finals = panel.iloc[-1, :-1]
    finite = tdf[~tdf.roi.isna()]
    summary = {
        "n_companies": len(bal_series),
        "n_trades": len(tdf),
        "n_tp": int((tdf.kind == "tp").sum()),
        "n_sl": int((tdf.kind == "sl").sum()),
        "n_mc": int((tdf.kind == "mc").sum()),
        "n_nan_roi": int(tdf.roi.isna().sum()),
        "roi_sum_finite": round(float(finite.roi.sum()), 6),
        "panel_rows": int(panel.shape[0]),
        "panel_cols": int(panel.shape[1]),
        "total_roi_pct": round(float(roi * 100), 6),
        "days": int(days),
        "annualized_pct": round(float(((roi + 1) ** (365 / days) - 1) * 100), 6),
        "profitable_share": round(float((finals > 1000).sum() / len(finals)), 9),
        "bal_rows": int(sum(len(s) for s in bal_series.values())),
    }
    fin = pd.DataFrame({"company": list(bal_series.keys()),
                        "final_balance": [round(float(s.iloc[-1]), 6)
                                          for s in bal_series.values()]}) \
        .sort_values("company")
    fin.to_parquet(os.path.join(OUT, "final_balances.parquet"), index=False)
    return summary


if __name__ == "__main__":
    goldens = {"brk": brk_chain(), "intraday": intraday_chain()}
    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(goldens, f, indent=1, sort_keys=True)
    print(json.dumps(goldens, indent=1, sort_keys=True))

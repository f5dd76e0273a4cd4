"""Fit per-op scaling exponents from the three-point ladder in
BENCH_sf1_appendix.json (sf0.1/sf1/sf3 = 1x/10x/30x rows, one recipe)
and write them back as scale_ladder.fit — turning the "survives 100x"
claim into a regression line instead of a verdict sentence.

Two exponents per op, because a single log-log slope over raw times is
biased by Spark's fixed per-query overhead (planning + task schedule),
which DOMINATES at bench SFs and drags the slope toward 0:

  * exponent_loglog — least-squares slope of ln(t) vs ln(n) over all
    three points. The honest "what we measured" number; <= ~1.1 means
    the measured cost curve is at-most-linear across the ladder.
  * exponent_tail   — ln(t_30x / t_10x) / ln(3), the marginal slope
    between the two LARGEST points, where overhead has partly
    amortized. The better predictor of 100x behavior; still an
    underestimate of asymptotic slope while overhead remains visible,
    and noisy for sub-second flat ops (best-of-2 jitter on a ~0.4s op
    moves it by ±0.2) — read it with the absolute seconds.

Extrapolation note: predicted t(100x) = t(30x) * (100/30)^exponent_tail
is recorded per op. For flat/overhead-dominated ops this is ~t(30x).
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
)

from bench import family  # noqa: E402  (the single classifier)


def main() -> None:
    path = os.path.join(os.path.dirname(__file__), "..", "BENCH_sf1_appendix.json")
    path = os.path.abspath(path)
    with open(path) as f:
        d = json.load(f)
    xs = [math.log(1.0), math.log(10.0), math.log(30.0)]
    fit_note = (
        "exponent_loglog: 3-point ln(t)~ln(n) slope (overhead-biased "
        "toward 0 at bench SFs); exponent_tail: marginal slope between "
        "10x and 30x, the better 100x predictor; pred_100x_sec = "
        "t(30x)*(100/30)^tail. Pass bar per VERDICT r3 #5: linear-path "
        "ops <= ~1.1. See scripts/fit_scale_ladder.py."
    )
    # fit every section that carries a full three-point triple
    for sect_name, sect in d.items():
        if not (
            isinstance(sect, dict)
            and all(k in sect for k in ("sf01_sec", "sf1_sec", "sf3_sec"))
        ):
            continue
        fit: dict[str, dict] = {}
        for op in sect["sf01_sec"]:
            ts = [
                sect["sf01_sec"][op],
                sect["sf1_sec"][op],
                sect["sf3_sec"][op],
            ]
            ys = [math.log(t) for t in ts]
            xbar, ybar = sum(xs) / 3, sum(ys) / 3
            slope = sum(
                (x - xbar) * (y - ybar) for x, y in zip(xs, ys)
            ) / sum((x - xbar) ** 2 for x in xs)
            tail = (ys[2] - ys[1]) / (xs[2] - xs[1])
            fit[op] = {
                "family": family(op),
                "exponent_loglog": round(slope, 3),
                "exponent_tail": round(tail, 3),
                "pred_100x_sec": round(ts[2] * (100.0 / 30.0) ** tail, 2),
            }
        sect["fit"] = fit
        sect["fit_note"] = fit_note
        print(f"-- {sect_name}")
        for op, v in sorted(
            fit.items(), key=lambda kv: -kv[1]["exponent_tail"]
        ):
            print(
                f"{op:28s} fam={v['family']:10s}"
                f" loglog={v['exponent_loglog']:+.3f}"
                f" tail={v['exponent_tail']:+.3f}"
                f" pred100x={v['pred_100x_sec']}s"
            )
    with open(path, "w") as f:
        json.dump(d, f, indent=1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Fold the 3-point scale sweeps (tools/sweep_r15_3pt.sh and its uniform
twin) into BENCH_registry_r15.json as `three_point_zipf` /
`three_point_uniform` sections.

For each query timed at the three log-spaced scales (0.1 / 0.3 / 1.0),
fits runtime ~ scale^e by OLS over (ln scale, ln sec) and reports the
exponent with the three raw timings. e <= ~1.15 is linear-or-better;
output-/input-mass-bound enumerators (geo1/geo2, dd4, sim4b/c, dd3c/e,
g6) are expected above that and carry their r15 diagnoses.

Usage: fit_3pt.py  (expects /tmp/3pt_r15_{zipf01,zipf03,zipf1}.json and
/tmp/3ptu_r15_{unif01,unif03,unif1}.json)
"""
import json
import math

# w6d_kml's zipf 0.1 leg is unusable: the fused-KML render is the
# registry's most codegen-sensitive query and 44.5 s in-suite on a corpus
# it ran at 2.45 s in the round's flagged_r2 pass is the DOCUMENTED
# code-cache pathology (verify SKILL.md: giant fused expressions re-pay C2
# between suite passes), not growth; a solo re-check then landed in a
# neighbor-steal burst (sentinel 1.29 s vs the 0.2 s norm, 17.1 s).
# Excluded with reason rather than patched; flagged_r2's gateable
# two-point growth (2.447 -> 13.673 s, 5.59x) stands as w6d's scale row.
EXCLUDED = {
    "zipf": {"w6d_kml": "code-cache pathology in-suite (44.5s vs 2.45s "
                        "flagged_r2 on the same corpus) + steal burst on "
                        "the solo re-check; flagged_r2 growth 5.59x stands"},
    "uniform": {},
}

REGIMES = {
    "zipf": [("/tmp/3pt_r15_zipf01.json", 0.1),
             ("/tmp/3pt_r15_zipf03.json", 0.3),
             ("/tmp/3pt_r15_zipf1.json", 1.0)],
    "uniform": [("/tmp/3ptu_r15_unif01.json", 0.1),
                ("/tmp/3ptu_r15_unif03.json", 0.3),
                ("/tmp/3ptu_r15_unif1.json", 1.0)],
}

WHAT = ("Continuation-session 3-point scale curve: the r15 flagged set "
        "(+ geo2_knn_within_radius{extra}) re-timed at three log-spaced "
        "{regime}-vocab scales (0.1/0.3/1.0, same-seed regenerated "
        "corpora), SPARK_GRAFT_REPEATS=2, all three runs back-to-back so "
        "the fitted exponents are self-relative (the box sat in a slower "
        "regime than the round-close bench: ~11% steal under full load, "
        "multi-job queries 1.3-2.4x the committed bench while sentinels "
        "matched — absolute secs here are NOT comparable to "
        "bench_full.json, the exponents are).")

art = json.load(open("/root/repo/BENCH_registry_r15.json"))
for regime, scales in REGIMES.items():
    runs, sentinels = {}, {}
    for path, sc in scales:
        d = json.load(open(path))
        runs[sc] = d["queries"]
        sentinels[str(sc)] = [d["sentinel_sec"], d["sentinel_end_sec"]]
        assert not d["failed"], (path, d["failed"])
    excluded = EXCLUDED[regime]
    names = sorted(
        set.intersection(*(set(q) for q in runs.values())) - set(excluded))
    out = {}
    for n in names:
        pts = [(sc, runs[sc][n]) for _, sc in scales]
        xs = [math.log(sc) for sc, _ in pts]
        ys = [math.log(max(t, 1e-3)) for _, t in pts]
        mx, my = sum(xs) / 3, sum(ys) / 3
        e = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs)
        out[n] = {
            "sec": {str(sc): t for sc, t in pts},
            "exponent": round(e, 2),
            "growth_10x_from_fit": round(10 ** e, 1),
        }
    art[f"three_point_{regime}"] = {
        "what": WHAT.format(
            regime=regime,
            extra=" + tok5_bpe_encode_1k" if regime == "uniform" else ""),
        "method": {"repeats": 2, "scales": [s for _, s in scales],
                   "fit": "OLS of ln(sec) ~ ln(scale), min-of-2 per point",
                   "sentinels": sentinels},
        "excluded": excluded,
        "queries": out,
    }
    print(f"=== {regime} ===")
    for n, v in sorted(out.items(), key=lambda kv: -kv[1]["exponent"]):
        print(f"{v['exponent']:5.2f}  {v['growth_10x_from_fit']:6.1f}x/10x  "
              f"{n:42s} {v['sec']}")
json.dump(art, open("/root/repo/BENCH_registry_r15.json", "w"), indent=1)

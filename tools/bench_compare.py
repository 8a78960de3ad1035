#!/usr/bin/env python3
"""Bench-sample contention triage (dev tool, round 11).

Rounds 9 and 10 both spent judge/builder time hand-proving that a
slow driver bench sample was host contention, not a code regression:
compute the per-query ratio against a same-code regen, check whether
the median is a uniform factor, and annotate the >2x outliers with
their recorded 1-min load averages (the `loads` map Bench.scala has
written since round 10). This tool IS that three-line verdict.

Usage: python3 tools/bench_compare.py <baseline.json> <sample.json>

Reading the verdict:
  - median ratio ~1.0x            -> same steady state
  - uniform 1.1-1.5x, flat spread -> host contention on the sample
  - >2x outliers at elevated load -> contended slots, not code
  - >2x outliers at IDLE load     -> investigate as a real regression

Header record (run against the round-10 pair: the driver's post-HEAD
sample vs the 155.70s builder regen at the same HEAD):
  median per-query ratio 1.067x over 250 queries (total 179.37s vs
  155.70s); 12 queries >2x (q63 3.64x ... q78 2.01x), q79 at recorded
  load 2.2 -> 4.5 (elevated), the rest at FLAT recorded load -- which
  is itself a finding: those loads were sampled once AFTER all runs
  (the pre-round-11 Bench), so a spike during the cold/first-warm run
  is invisible by sample time; the cluster of 2-3.6x outliers packed
  into one contiguous stretch of the run order with a uniform 1.067x
  background is the contention shape, and motivated the round-11
  change to sample load before the cold run and after every warm run,
  recording the max. Tool verdict on the r10 pair: MIXED (honest,
  given the trailing-sample loads); judge verdict: CONTENTION.
"""
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    qs = d.get("queries", {})
    loads = d.get("loads", {})
    # driver BENCH_r{N}.json files may carry short ids; long names in
    # BENCH_FULL. Normalize both sides to the short id ("q101_x" -> "q101").
    def short(k):
        return k.split("_")[0]
    return ({short(k): v for k, v in qs.items()},
            {short(k): v for k, v in loads.items()},
            d.get("value"),
            d.get("anchors"))


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    bq, bl, btot, ba = load(sys.argv[1])
    sq, sl, stot, sa = load(sys.argv[2])
    common = sorted(set(bq) & set(sq), key=lambda k: (len(k), k))
    if not common:
        sys.exit("no common queries between the two files")
    ratios = {k: (sq[k] / bq[k] if bq[k] > 0 else float("inf")) for k in common}
    med = statistics.median(ratios.values())
    btot = btot if btot is not None else sum(bq[k] for k in common)
    stot = stot if stot is not None else sum(sq[k] for k in common)
    print(f"median per-query ratio {med:.3f}x over {len(common)} queries "
          f"(total {stot:.2f}s vs {btot:.2f}s)")
    # Absolute anchors (Bench.scala writes them since round 13): the
    # host factor measured directly by fixed work, not inferred from
    # round-over-round query ratios. Residual = median / spark-anchor
    # ratio; residual ~1.0x means the whole drift was the host.
    if ba and sa:
        # end anchors only: the start sample pays one-time JIT/codegen on
        # a cold JVM (measured 0.359 -> 0.152 s across one r13 run), so
        # the warm end-of-run sample is the host-speed fixed point; the
        # start/end spread is reported as within-run drift instead.
        jr = sa["jvm_end"] / ba["jvm_end"]
        sr = sa["spark_end"] / ba["spark_end"]
        print(f"anchor ratio (end-of-run): jvm {jr:.3f}x spark {sr:.3f}x "
              f"(within-run drift: jvm "
              f"{sa['jvm_end'] / max(sa['jvm_start'], 1e-9):.2f}x, spark "
              f"{sa['spark_end'] / max(sa['spark_start'], 1e-9):.2f}x cold->warm)")
        print(f"host-normalized median: {med / sr:.3f}x "
              f"({'host explains the drift' if abs(med / sr - 1.0) < 0.05 else 'residual is code or mixed'})")
    outliers = sorted((k for k in common if ratios[k] > 2.0),
                      key=lambda k: -ratios[k])
    if not outliers:
        print("no query >2x; samples agree to within the uniform factor")
    for k in outliers:
        lb = bl.get(k)
        ls = sl.get(k)
        ann = ""
        if lb is not None and ls is not None:
            ann = f"  load {lb:.1f} -> {ls:.1f}" + (
                "  (elevated: contended slot)" if ls > 1.5 * max(lb, 1.0)
                else "  (load flat: INVESTIGATE as regression)")
        print(f"  {k}: {bq[k]:.3f}s -> {sq[k]:.3f}s ({ratios[k]:.2f}x){ann}")
    if med > 1.05 and outliers and all(
            sl.get(k, 0) > 1.5 * max(bl.get(k, 1.0), 1.0) for k in outliers if k in sl):
        verdict = "CONTENTION (uniform factor + all outliers at elevated load)"
    elif any(k in sl and k in bl and sl[k] <= 1.5 * max(bl[k], 1.0) for k in outliers):
        verdict = "MIXED: at least one >2x outlier at flat load -- investigate"
    elif med <= 1.05 and not outliers:
        verdict = "SAME STEADY STATE"
    else:
        verdict = "CONTENTION-shaped (uniform factor, no idle-load outliers)"
    print(f"verdict: {verdict}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Diff two bench records and flag per-query movers.

    python3 tools/bench_diff.py OLD NEW [--threshold 1.5]

Accepts either bench format:
  - the durable record Bench.scala writes (SPARK_GRAFT_BENCH_OUT /
    /tmp/graft_bench.json): one JSON object with a "queries" map — when the
    file holds several JSON lines (append mode), the LAST parseable line
    wins;
  - a driver BENCH_rN.json whose "tail" field carries a (possibly
    truncated) stdout capture: per-query times are recovered with a regex,
    so a record that lost its head still contributes every surviving time.

Movers are queries whose new/old ratio is >= threshold or <= 1/threshold.
Sub-second queries swing up to 3.5x between identical-code runs on this
workload (see Bench.scala), so the report marks movers whose BOTH times
are < 1s as inside the noise band — adjudicate those with a quiet re-run
before touching code. Exit code is always 0: this is a triage report, not
a gate.
"""
import json
import re
import sys

TIME_RE = re.compile(r'"(q\w+)":([0-9][0-9.eE+-]*)')


def load_times(path):
    with open(path) as f:
        text = f.read()
    times = {}
    # durable format: last parseable JSON line with a "queries" map
    for line in reversed(text.strip().splitlines()):
        try:
            obj = json.loads(line)
        except ValueError:
            continue
        if not isinstance(obj, dict):  # a bare 'null'/number line
            continue
        qs = obj.get("queries")
        if isinstance(qs, dict):
            return {k: v for k, v in qs.items() if isinstance(v, (int, float))}
    # driver format: whole file is one JSON object with a "tail" capture
    try:
        obj = json.loads(text)
        blob = obj.get("tail", "") if isinstance(obj, dict) else text
    except ValueError:
        blob = text
    for name, sec in TIME_RE.findall(blob):
        times[name] = float(sec)
    return times


def main():
    argv = sys.argv[1:]
    args, thr, i = [], 1.5, 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--threshold"):
            if "=" in a:
                thr = float(a.split("=", 1)[1])
            else:
                i += 1  # flag value is the ADJACENT token, wherever the
                if i >= len(argv):  # flag sits relative to the paths
                    sys.exit("--threshold needs a value\n" + __doc__)
                thr = float(argv[i])
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        sys.exit(__doc__)
    old, new = load_times(args[0]), load_times(args[1])
    shared = sorted(set(old) & set(new))
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))

    movers = []
    for q in shared:
        ratio = new[q] / old[q] if old[q] > 0 else float("inf")
        if ratio >= thr or ratio <= 1 / thr:
            noise = " (sub-second both sides: noise band)" \
                if old[q] < 1.0 and new[q] < 1.0 else ""
            movers.append((ratio, q, noise))
    movers.sort(reverse=True)

    t_old = sum(old[q] for q in shared)
    t_new = sum(new[q] for q in shared)
    print(f"shared queries: {len(shared)}  "
          f"(old-only: {len(only_old)}, new-only: {len(only_new)})")
    print(f"shared-query total: {t_old:.2f}s -> {t_new:.2f}s "
          f"({t_new / t_old:.3f}x)" if t_old else "no shared queries")
    if only_new:
        print(f"new queries: {', '.join(only_new)}")
    if only_old:
        print(f"dropped queries: {', '.join(only_old)}")
    print(f"\nmovers (ratio >= {thr}x either way): {len(movers)}")
    for ratio, q, noise in movers:
        print(f"  {q}: {old[q]:.3f}s -> {new[q]:.3f}s  {ratio:.2f}x{noise}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Outlier-vs-pin checker for bench artifacts (VERDICT r19 #5).

Diffs any BENCH json against a round's warm/cold pin pair and emits the
outlier-vs-pin table the round doc opens with. The pin for a gate is the
MIN of its cold and warm times (the best same-HEAD isolated measurement);
a gate is an outlier when the artifact lands above FACTOR x pin AND more
than FLOOR seconds over it (tiny gates jitter multiplicatively without
meaning anything).

Usage:
  python3 tools/bench_outliers.py BENCH_rN.json BENCH_WARMCOLD_rN.json \
      [--factor 2.0] [--floor 0.3] [--md]

Accepts both artifact shapes: the driver's wrapper ({"parsed": {...}})
and a raw bench line ({"queries": {...}}), and pin files shaped either
{"cold": {...}, "warm": {...}} or a single bench line.
"""
import json
import sys


def queries_of(path):
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    return d.get("queries", {})


def pins_of(path):
    with open(path) as f:
        d = json.load(f)
    if "cold" in d or "warm" in d:
        sides = [d[k].get("queries", {}) for k in ("cold", "warm") if k in d]
    else:
        if "parsed" in d and isinstance(d["parsed"], dict):
            d = d["parsed"]
        sides = [d.get("queries", {})]
    pins = {}
    for side in sides:
        for name, sec in side.items():
            pins[name] = min(pins.get(name, float("inf")), sec)
    return pins


def main(argv):
    factor = 2.0
    floor = 0.3
    md = False
    positional = []
    i = 0
    # both --k=v and --k v spellings (the usage line shows the latter)
    def parse(flag, raw):
        try:
            return float(raw)
        except (TypeError, ValueError):
            print(f"flag {flag} needs a numeric value, got {raw!r}\n{__doc__}")
            raise SystemExit(2)
    while i < len(argv):
        a = argv[i]
        if a.startswith("--factor="):
            factor = parse("--factor", a.split("=", 1)[1])
        elif a.startswith("--floor="):
            floor = parse("--floor", a.split("=", 1)[1])
        elif a == "--factor":
            factor = parse(a, argv[i + 1] if i + 1 < len(argv) else None)
            i += 1
        elif a == "--floor":
            floor = parse(a, argv[i + 1] if i + 1 < len(argv) else None)
            i += 1
        elif a == "--md":
            md = True
        elif a.startswith("--"):
            print(f"unknown flag {a}\n{__doc__}")
            return 2
        else:
            positional.append(a)
        i += 1
    if len(positional) < 2:
        print(__doc__)
        return 2
    got = queries_of(positional[0])
    pins = pins_of(positional[1])
    rows = []
    unpinned = sorted(set(got) - set(pins))
    for name in sorted(got):
        if name not in pins:
            continue
        g, p = got[name], pins[name]
        if p > 0 and g > factor * p and g - p > floor:
            rows.append((name, g, p, g / p))
    if md:
        print(f"| gate | artifact s | pin s | ratio |")
        print(f"|---|---|---|---|")
        for name, g, p, r in sorted(rows, key=lambda x: -x[3]):
            print(f"| {name} | {g:.2f} | {p:.2f} | {r:.1f}x |")
        if not rows:
            print(f"| _none_ | | | |")
    else:
        for name, g, p, r in sorted(rows, key=lambda x: -x[3]):
            print(f"OUTLIER {name}: {g:.2f}s vs pin {p:.2f}s ({r:.1f}x)")
        print(f"== {len(rows)} outlier(s) over {len(got)} gates "
              f"(factor {factor}, floor {floor}s); "
              f"{len(unpinned)} unpinned gate(s)"
              f"{': ' + ', '.join(unpinned) if unpinned else ''} ==")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

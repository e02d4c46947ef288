#!/usr/bin/env python3
"""Merge N controlled graft.Bench pass files into the committed
bench_out.json envelope: min per query (box noise is one-sided — a
quiet pass is the truthful cost), min setup per artifact, min per
paired arm, with explicit provenance so a contended driver run
(bench_out_driver.json, the Bench default) can never be mistaken for
the controlled envelope.

Usage: python3 tools/bench_merge.py bench_pass1.json [bench_pass2.json ...]
Writes /root/repo/bench_out.json and prints a one-line summary.
"""
import json
import sys


def merge(paths):
    passes = [json.load(open(p)) for p in paths]
    base = dict(passes[0])

    def min_map(key):
        # min over the VALID measurements only, order-independent: a -1
        # failure marker survives into the envelope only when a query
        # failed in EVERY pass (one noisy pass must not erase a real
        # timing from another, in either argument order)
        out = {}
        for p in passes:
            for k, v in p.get(key, {}).items():
                valid = isinstance(v, (int, float)) and v >= 0
                cur = out.get(k)
                cur_valid = isinstance(cur, (int, float)) and cur is not None \
                    and cur >= 0
                if k not in out:
                    out[k] = v
                elif valid and (not cur_valid or v < cur):
                    out[k] = v
        return out

    base["queries"] = min_map("queries")
    base["setup"] = min_map("setup")
    base["setup_sec"] = min(p.get("setup_sec", float("inf")) for p in passes)
    if any("paired" in p for p in passes):
        base["paired"] = min_map("paired")
    base["value"] = round(sum(v for v in base["queries"].values()
                              if isinstance(v, (int, float)) and v >= 0), 3)
    base["provenance"] = f"controlled-min-of-{len(passes)}"
    base["passes"] = [p.split("/")[-1] for p in paths]
    base["out_file"] = "/root/repo/bench_out.json"
    return base


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    merged = merge(sys.argv[1:])
    with open("/root/repo/bench_out.json", "w") as f:
        json.dump(merged, f, separators=(",", ":"))
        f.write("\n")
    n = len(merged["queries"])
    bad = [k for k, v in merged["queries"].items()
           if not isinstance(v, (int, float)) or v < 0]
    print(f"bench_out.json: {merged['provenance']}, {n} queries, "
          f"total {merged['value']:.1f} s, failed {bad or 'none'}")

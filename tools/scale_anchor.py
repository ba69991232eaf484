#!/usr/bin/env python3
"""Replicate the anchor corpus N-fold for ETL scale probes (driver-side
tooling). Each copy rewrites the `tx` field (dedup-key component) with a
per-copy suffix so the replicas are DISTINCT events: the planted
duplicate keys and audit violations scale proportionally (x N) instead
of every row becoming a 10-way duplicate, keeping the work profile of
the pipeline (dedup selectivity, audit hit rates, date range) identical
to the 1x anchor at N times the volume.

    python3 tools/gen_anchor.py /tmp/graft_anchor_raw
    python3 tools/scale_anchor.py /tmp/graft_anchor_raw /tmp/graft_anchor_raw10 10
    sbt "runMain graft.RunPipeline /tmp/graft_anchor_raw10 /tmp/anchor10_out --repeat 3"
"""
import os
import sys


def main(src, dst, factor):
    os.makedirs(dst, exist_ok=True)
    for name in sorted(os.listdir(src)):
        if not name.endswith(".csv"):
            continue
        with open(os.path.join(src, name), encoding="latin-1") as f:
            lines = f.readlines()
        header, body = lines[0], lines[1:]
        with open(os.path.join(dst, name), "w", encoding="latin-1") as out:
            out.write(header)
            for c in range(factor):
                suffix = f"x{c}"
                for line in body:
                    parts = line.split(",")
                    # tx is column 7 (0-based 6) in the anchor header
                    parts[6] = parts[6] + suffix
                    out.write(",".join(parts))
        print(f"{name}: {len(body)} rows -> {factor * len(body)}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 10)

#!/usr/bin/env python3
"""Seeded generator for the ETL anchor corpus (driver-side tooling).

Reproduces the SHAPE of the reference's one committed real run
(opensea_pipeline/clean/2025-10-31_02-04-53/{metrics.json,_run.log}:
1,563,309 raw -> 1,557,807 clean, transfer > sale > mint mix, date range
2021-04-22..2025-10-16) so the README's single-node anchor numbers are
reproducible end-to-end:

    python3 tools/gen_anchor.py /tmp/anchor_raw
    sbt "runMain graft.RunPipeline /tmp/anchor_raw /tmp/anchor_out --repeat"

Deterministic (fixed seed, no time/os entropy). Planted facts the run
must land on:
  raw rows          1,563,309  (body 1,557,805 + 2 anchors + 4,000 dups
                                + 1,502 negatives)
  clean rows        1,557,807  (dups deduped, negative prices dropped)
  duplicate keys        4,000
  negative prices       1,502  (carrying the other audit violations:
                                300 out-of-range ts, 300 bad seller,
                                200 null collection, 200 unknown type)
  event types       transfer > sale > mint (4:2:1-ish)
  priced rows       sales only (transactions_with_price < null_prices)
  date range        2021-04-22 .. 2025-10-16 (pinned by 2 anchor rows)

Same corpus pattern as GoldenParitySpec at 142x its scale; one CSV per
collection (exercises the S1 multi-file union-by-name path), with the
`milady` file carrying the optional rarity columns (exercises
union-by-name across differing schemas).
"""
import random
import sys

SEED = 7
MIN_DATE, MAX_DATE = "2021-04-22", "2025-10-16"
T0, T1 = 1619049600, 1760572800  # 2021-04-22T00Z, 2025-10-16T00Z
COLLECTIONS = [  # name -> clean body rows (desc, like the golden file)
    ("azuki", 420_000), ("clonex", 350_000), ("pudgypenguins", 260_000),
    ("boredapeyachtclub", 210_000), ("milady", 150_000),
    ("cool-cats-nft", 90_000), ("shadow-a", 50_000), ("shadow-b", 27_805),
]
N_DUPS, N_NEGATIVE = 4_000, 1_502
HEADER = ("chain,collection,identifier,event_type,time_utc,timestamp,tx,"
          "seller,buyer,from_address,to_address,quantity,price_total,"
          "currency_symbol,contract,token_id,price_each")
SELLER = "0xAAaAaAAAaaaAAaaAAAaaaaAAaAaaaAAaAAAaaB12"
BUYER = "0xBBbBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBB34"


def mk_row(row_id, coll, et, priced, ts, rarity=None):
    price = f"{1 + row_id % 50}.25" if priced else "0.0"
    base = (f"ethereum,{coll},{row_id},{et},,{ts},0xT{row_id},"
            f"{SELLER},{BUYER},{SELLER},{BUYER},"
            f"1,{price},ETH,0xC1,tok{row_id % 9973},")
    if rarity is not None:
        base += f",{rarity},{rarity / 10.0}"
    return base


def main(out_dir):
    import os
    os.makedirs(out_dir, exist_ok=True)
    rnd = random.Random(SEED)
    row_id = 0
    first_file_extra = []  # anchors + dups + negatives ride the first file

    for ci, (coll, n) in enumerate(COLLECTIONS):
        has_rarity = coll == "milady"
        header = HEADER + (",rarity_rank,rarity_score" if has_rarity else "")
        lines = [header]
        for i in range(n):
            row_id += 1
            et = ("sale", "sale", "mint", "transfer", "transfer",
                  "transfer", "transfer")[i % 7]
            ts = T0 + rnd.randrange(T1 - T0)
            lines.append(mk_row(row_id, coll, et, et == "sale", ts,
                                rarity=(i % 10_000 + 1) if has_rarity else None))
        if ci == 0:
            # exact anchor rows pinning the date-range ends
            anchors = [mk_row(row_id + 1, coll, "transfer", False, T0),
                       mk_row(row_id + 2, coll, "transfer", False, T1)]
            row_id += 2
            # duplicate rows: repeat body lines verbatim (same
            # tx/token/type/timestamp -> dedup-key collision)
            dups = lines[1:1 + N_DUPS]
            # negative prices: dropped by the cleaner, invisible in
            # metrics -- the carrier for every other planted violation
            negatives = []
            for i in range(N_NEGATIVE):
                ts = 100 + i if i < 300 else T0 + i      # 300 out-of-range
                seller = "JUNK" if 300 <= i < 600 else ""  # 300 bad format
                c = "" if 600 <= i < 800 else coll         # 200 null coll
                et = "airdrop" if 800 <= i < 1000 else "sale"  # 200 unknown
                negatives.append(f"ethereum,{c},neg{i},{et},,{ts},0xN{i},"
                                 f"{seller},,,,1,-5.0,ETH,0xC1,tokneg{i},")
            first_file_extra = anchors + dups + negatives
            lines += first_file_extra
        with open(f"{out_dir}/{coll}.csv", "w") as f:
            f.write("\n".join(lines) + "\n")

    body = sum(n for _, n in COLLECTIONS)
    raw = body + 2 + N_DUPS + N_NEGATIVE
    print(f"wrote {len(COLLECTIONS)} CSVs to {out_dir}")
    print(f"raw rows:   {raw:,} (expect 1,563,309)")
    print(f"clean rows: {body + 2:,} (expect 1,557,807)")
    print(f"dup keys:   {N_DUPS:,}  negative prices: {N_NEGATIVE:,}")
    print(f"date range: {MIN_DATE} .. {MAX_DATE}")
    assert raw == 1_563_309 and body + 2 == 1_557_807


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/anchor_raw")

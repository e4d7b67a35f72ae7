#!/usr/bin/env python3
"""Deterministic generator for fixtures/fx.csv — a clean
header-carrying CSV dim (currency -> micro-USD per unit) for the
strict-schema CSV-datasource judged query (q29_csv_source). Covers
the DSv2 csv reader (header handling, explicit schema) as opposed to
the reference-parity text+split path. Integral micro-USD so the
cross-engine compare is exact. Seed 11; rerunning is byte-stable.
"""
import random
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "fixtures" / "fx.csv"

rnd = random.Random(11)
currencies = ["USD", "EUR", "JPY", "GBP", "INR", "BRL", "CAD", "AUD"]

lines = ["currency,usd_per_unit_micro"]
for c in currencies:
    micro = 1_000_000 if c == "USD" else rnd.randrange(5_000, 2_000_000)
    lines.append(f"{c},{micro}")

OUT.parent.mkdir(parents=True, exist_ok=True)
OUT.write_text("\n".join(lines) + "\n")
print(f"wrote {OUT}: {len(lines)} lines")

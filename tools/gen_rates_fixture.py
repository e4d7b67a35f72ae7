#!/usr/bin/env python3
"""Deterministic generator for fixtures/rates.json — a JSON-lines
side table (per-nation billing rates) for the JSON-datasource judged
query (q28_json_source). One object per nation key 0-24 (the TPC-H
nation table), with a nested `limits` object so the explicit-schema
read exercises struct fields, and all numerics integral (basis
points / cents) so the cross-engine compare is exact.

Output is committed; rerunning reproduces it byte-for-byte (seed 7).
"""
import json
import random
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "fixtures" / "rates.json"

rnd = random.Random(7)
currencies = ["USD", "EUR", "JPY", "GBP", "INR", "BRL", "CAD", "AUD"]

lines = []
for k in range(25):
    lines.append(json.dumps({
        "n_nationkey": k,
        "currency": currencies[rnd.randrange(len(currencies))],
        "tax_bp": rnd.randrange(0, 2500),            # basis points
        "surcharge_cents": rnd.randrange(0, 1000),
        "limits": {
            "min_order_cents": rnd.randrange(0, 10_000),
            "max_order_cents": rnd.randrange(1_000_000, 100_000_000),
        },
    }, separators=(",", ":")))

OUT.parent.mkdir(parents=True, exist_ok=True)
OUT.write_text("\n".join(lines) + "\n")
print(f"wrote {OUT}: {len(lines)} lines")

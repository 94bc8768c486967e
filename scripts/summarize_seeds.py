"""Collate per-seed stream-campaign JSONs into N=3 mean +- half-spread rows.

    python scripts/summarize_seeds.py outputs/r5/defense_full_seed{0,1,2}.json
    python scripts/summarize_seeds.py --gate outputs/r5/gate_adapt_seed{0,1,2}.json

Prints one line per arm: avg_dc mean +- half-spread (per-seed values), plus
per-domain means — the exact numbers the BASELINE N=3 tables carry.
"""

from __future__ import annotations

import argparse
import json


def half_spread(vals):
    return (max(vals) - min(vals)) / 2.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+")
    ap.add_argument("--gate", action="store_true",
                    help="gate-protocol files (rows + verdict)")
    args = ap.parse_args()

    data = [json.load(open(f)) for f in args.files]
    if args.gate:
        keys = sorted({k for d in data for k in d["verdict"]
                       if isinstance(d["verdict"].get(k), (int, float))})
        for k in keys:
            vals = [d["verdict"].get(k) for d in data]
            if any(v is None for v in vals):
                continue
            mean = sum(vals) / len(vals)
            print(f"{k}: {mean:.4f} +- {half_spread(vals):.4f}  "
                  f"({' / '.join(f'{v:.4f}' for v in vals)})")
        for d, f in zip(data, args.files):
            v = d["verdict"]
            print(f"{f}: fwd={v.get('forward_batches')} adapt={v.get('adapt_batches')} "
                  f"escalations={[e.get('batch') for e in v.get('escalations', [])]}")
        return

    arms = {}
    for d in data:
        for r in d["rows"]:
            arm = r.get("arm", r.get("policy"))
            arms.setdefault(arm, []).append(r)
    for arm, rows in arms.items():
        vals = [r["avg_dc"] for r in rows]
        mean = sum(vals) / len(vals)
        parts = [f"{arm}: {mean:.4f} +- {half_spread(vals):.4f}",
                 f"({' / '.join(f'{v:.4f}' for v in vals)})"]
        for dom in ("CHUP", "CHMR"):
            dv = [r.get(f"dom/{dom}/avg_dc") for r in rows]
            if all(v is not None for v in dv):
                parts.append(f"{dom}={sum(dv)/len(dv):.4f}"
                             f"({' / '.join(f'{v:.3f}' for v in dv)})")
        print("  ".join(parts))


if __name__ == "__main__":
    main()

"""Print the driver-rotation slice the way the grading driver will see
it: tier composition, the mechanically derived pins with their reasons
(mitoscape_spark/rotation.py), and the first <cap> names in order.

Usage: python tools/rotation_report.py [--cap 50]
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=50)
    args = ap.parse_args()

    import __spark_entry__ as entry
    from mitoscape_spark.queries import ORACLE, QUERIES
    from mitoscape_spark.rotation import derive_pins

    latest = {n: rnd for n, (rnd, _r) in entry._verdict_history().items()}
    explain: dict[str, str] = {}
    derived = derive_pins(latest, QUERIES, explain=explain)
    if derived is None:
        print("derivation FAILED — rotation falls back to hand pins:")
        print(sorted(entry._ROTATION_PINS))
        return 1

    ordered = list(entry.queries())
    full = entry._verdict_history()

    pins_all = derived | entry._ROTATION_PINS
    # same ghost-guard (n in QUERIES) + staleness-ceiling logic as
    # __spark_entry__.queries() — this report must show the driver's
    # actual slice (round-10 advice item 1 / verdict item 1)
    tier5 = {
        n
        for n, (rnd, res) in full.items()
        if n in QUERIES
        and res.get("err") == "no_oracle"
        and n not in ORACLE
        and n not in pins_all
    }
    latest_round = max((rnd for rnd, _res in full.values()), default=0)
    overdue = {
        n for n in tier5
        if latest_round - full[n][0] >= entry._TIER5_MAX_LAG
    }
    drip_pool = tier5 - overdue
    drip = (
        min(drip_pool, key=lambda n: (full[n][0], n)) if drip_pool else None
    )
    promoted = overdue | ({drip} if drip else set())

    def tier(name: str) -> int:
        if name not in full:
            return 0
        rnd, res = full[name]
        err = res.get("err")
        if err and err != "no_oracle":
            return 1
        if err == "no_oracle" and name in ORACLE:
            return 2
        if name in pins_all:
            return 3
        if name in tier5 and name not in promoted:
            return 5  # unchanged rows-only: drip-fed / ceiling-promoted
        return 4

    tiers = Counter(tier(n) for n in ordered)
    print(f"declared: {len(ordered)}  oracle: {len(ORACLE)}")
    print(f"tiers: {dict(sorted(tiers.items()))}")
    print(f"derived pins: {len(derived)} (hand overrides: "
          f"{len(entry._ROTATION_PINS)})")
    if promoted:
        tag = {n: "ceiling" for n in overdue}
        if drip:
            tag[drip] = "drip"
        # a promotion competes in tier 4 at its OWN verdict age
        # (oldest-first is the whole point — it must not displace
        # strictly-older records), so it can still fall outside the
        # 50-slot cap when the tier-4 backlog is older; show which
        # promotions actually land in the driver slice this round
        slice50 = set(ordered[:50])
        print(
            "tier-5 promotions this round: "
            + ", ".join(
                f"{n} ({tag[n]}, r{full[n][0]:02d}, "
                f"{'IN slice' if n in slice50 else 'outside cap — carries'})"
                for n in sorted(promoted)
            )
        )
    dropped = explain.get("__ubiquitous_dropped__")
    if dropped:
        # round-9 review finding 4: the conscious-hand-pin signal must
        # reach THIS tool, not just a stderr line lost in Spark logs
        print(
            "!! CHANGED BUT EXCLUDED AS UBIQUITOUS (>50% of query "
            "paths — dependents re-check only at tier-4 cap-rate; "
            f"hand-pin a broad re-check if semantic): {dropped}"
        )
        from mitoscape_spark.rotation import _repo_root, adjudication_token

        root = _repo_root()
        print(
            "   adjudicate in COVERAGE.md (content-hashed tokens — the "
            "test gate requires each, verbatim):"
        )
        for d in dropped.split(", "):
            print(f"     {adjudication_token(root, d)}")
    byround = Counter(latest.get(n) for n in derived)
    print(f"pins by latest-verdict round: {dict(sorted(byround.items()))}\n")
    print(f"--- driver slice (first {args.cap}) ---")
    for name in ordered[: args.cap]:
        rnd = latest.get(name)
        why = explain.get(name, "")
        tag = f"t{tier(name)} r{rnd:02d}" if rnd else "t0 ----"
        print(f"{tag}  {name}" + (f"  [{why}]" if why else ""))
    print("\n--- pinned but OUTSIDE the cap (carry over to next round) ---")
    for name in ordered[args.cap :]:
        if name in derived:
            print(f"r{latest.get(name):02d}  {name}  [{explain.get(name, '')}]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Regenerate plans/driver_history.json from the driver's CORRECTNESS
round files.

The registry's rotation policy ("every oracle-bearing query gets a
driver hash verdict; long-stable carriers rotate out first") needs the
per-query verdict history as DATA, not prose. This tool scans
CORRECTNESS_r*.json at the repo root and records, for every query name
ever seen, the list of rounds where the driver gave it a full
hash-green verdict. tests/test_entry_contract.py audits the priority
window against this file, so the policy is mechanically checkable.

Run after each driver round lands a new CORRECTNESS file:

    python tools/build_driver_history.py
"""

from __future__ import annotations

import json
import pathlib
import re

ROOT = pathlib.Path(__file__).resolve().parent.parent
OUT = (
    ROOT
    / "employee_data_management_system_data_engineering_solution_spark"
    / "plans"
    / "driver_history.json"
)


def build() -> dict[str, list[int]]:
    hist: dict[str, list[int]] = {}
    for path in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        data = json.loads(path.read_text())
        for name, rec in data.items():
            hist.setdefault(name, [])
            if rec.get("hash_match"):
                hist[name].append(rnd)
    return {k: sorted(set(v)) for k, v in sorted(hist.items())}


def main() -> None:
    hist = build()
    OUT.write_text(json.dumps(hist, indent=1) + "\n")
    never = sorted(k for k, v in hist.items() if not v)
    print(f"wrote {OUT.relative_to(ROOT)}: {len(hist)} queries tracked")
    print(f"never hash-green in any driver round: {never or 'none'}")


if __name__ == "__main__":
    main()

"""Headline-number hygiene checker (VERDICT r3 task 9; redesigned r5 task 2).

README.md and STATUS.md quote bench headline figures. Round 4's design
checked those quotes against `artifacts/BENCH_LOCAL.json` — the artifact
every `python bench.py` run overwrites — so the suite went red whenever
anyone re-ran bench and session variance (documented ±10%, tunnel latency)
moved a number. That converted measurement noise into test failure.

Round-5 design splits the two roles:

  * `artifacts/BENCH_PINNED.json` — the **number of record**. Committed,
    updated deliberately (run `python scripts/check_readme_numbers.py
    --repin` after a capture you want to promote, then update the docs).
    README/STATUS quotes must equal the pin at the quoted precision.
  * `artifacts/BENCH_LOCAL.json` — the **latest capture**, free to move.
    Compared against the pin within the documented ±10% session variance
    (REL_TOL); only drift beyond that fails, with a "re-pin" instruction.

Runs inside the test suite
(tests/test_train.py::test_readme_numbers_match_bench_artifact).

Quoting convention enforced:
  README.md : "rollout X.XX M edges/s/chip", "(Y.YY ms/span-step",
              "Z.ZZ M with the bf16", "train step W.WW M edges/s",
              "8-lane launch V.VV M"
  STATUS.md : the ```-fenced bench block with `key  value` rows.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Documented session-to-session tunnel-latency variance (README caveat).
REL_TOL = 0.10

# Keys compared between pin and latest capture (numeric headline figures).
DRIFT_KEYS = [
    "value",
    "rollout_ms_per_step_120um",
    "rollout_120um_bf16_pallas_fwd_edges_per_s",
    "rollout_40um_edges_per_s",
    "rollout_batched_8x120um_edges_per_s",
    "rollout_hybrid_8x120um_edges_per_s",
    "train_edges_per_s",
]


def _quote_m(x: float) -> str:
    """Format edges/s as the docs' 'X.XX M' convention."""
    return f"{x / 1e6:.2f}"


def check_docs_vs_pin(repo: Path, pin: dict) -> list[str]:
    """Docs must quote the pinned numbers exactly (at quoted precision)."""
    errors: list[str] = []
    readme = (repo / "README.md").read_text()
    checks = [
        (r"rollout ([\d.]+)\s*M edges/s/chip", pin["value"], "M", "README"),
        (r"\(([\d.]+) ms/span-step", pin["rollout_ms_per_step_120um"],
         "ms", "README"),
        (r"([\d.]+)\s*M with the bf16",
         pin["rollout_120um_bf16_pallas_fwd_edges_per_s"], "M", "README"),
        (r"train step ([\d.]+)\s*M edges/s", pin["train_edges_per_s"],
         "M", "README"),
        (r"8-lane launch ([\d.]+)\s*M",
         pin["rollout_batched_8x120um_edges_per_s"], "M", "README"),
        (r"hybrid 8-lane launch ([\d.]+)\s*M",
         pin["rollout_hybrid_8x120um_edges_per_s"], "M", "README"),
    ]
    for pattern, truth, kind, where in checks:
        m = re.search(pattern, readme)
        if not m:
            errors.append(f"{where}: pattern {pattern!r} not found")
            continue
        quoted = m.group(1)
        want = _quote_m(truth) if kind == "M" else f"{truth:.2f}"
        if quoted != want:
            errors.append(
                f"{where}: quoted {quoted} {kind} vs pin {want} {kind} "
                f"(pattern {pattern!r})"
            )

    status = (repo / "STATUS.md").read_text()
    block = re.search(r"```\n(rollout_edges_per_s_per_chip.*?)```", status,
                      re.S)
    if not block:
        errors.append("STATUS: bench block not found")
        return errors
    rows = {}
    for line in block.group(1).strip().splitlines():
        parts = line.split()
        if len(parts) >= 2:
            rows[parts[0]] = parts[1].replace(",", "")
    for key, bkey in [
        ("rollout_edges_per_s_per_chip", "value"),
        ("rollout_ms_per_step_120um", "rollout_ms_per_step_120um"),
        ("rollout_120um_bf16_pallas",
         "rollout_120um_bf16_pallas_fwd_edges_per_s"),
        ("rollout_hybrid_8x120um", "rollout_hybrid_8x120um_edges_per_s"),
        ("rollout_40um_edges_per_s", "rollout_40um_edges_per_s"),
        ("rollout_batched_8x120um", "rollout_batched_8x120um_edges_per_s"),
        ("train_edges_per_s", "train_edges_per_s"),
    ]:
        if key not in rows:
            errors.append(f"STATUS: bench row {key} missing")
            continue
        got = float(rows[key])
        want = float(pin[bkey])
        # STATUS quotes integers for rates, 2dp for ms
        tol = 0.5 if got == int(got) and want > 100 else 0.005
        if abs(got - round(want, 2)) > tol:
            errors.append(f"STATUS: {key} quoted {got} vs pin {want}")
    return errors


def check_pin_vs_latest(repo: Path, pin: dict) -> list[str]:
    """Latest capture may drift from the pin only within REL_TOL."""
    art = repo / "artifacts" / "BENCH_LOCAL.json"
    if not art.exists():
        return []  # no capture yet this session — nothing to compare
    latest = json.loads(art.read_text())
    errors: list[str] = []
    for key in DRIFT_KEYS:
        if key not in latest or key not in pin:
            continue
        p, l = float(pin[key]), float(latest[key])
        if p == 0:
            continue
        rel = abs(l - p) / abs(p)
        if rel > REL_TOL:
            errors.append(
                f"DRIFT beyond ±{REL_TOL:.0%}: {key} pin {p:g} vs latest "
                f"capture {l:g} ({rel:+.1%}) — if the change is real, re-pin "
                f"with `python scripts/check_readme_numbers.py --repin` and "
                f"update README/STATUS quotes"
            )
    return errors


def check(repo: Path = REPO) -> list[str]:
    pin_path = repo / "artifacts" / "BENCH_PINNED.json"
    if not pin_path.exists():
        return [
            f"missing {pin_path} — promote a capture with "
            "`python scripts/check_readme_numbers.py --repin`"
        ]
    pin = json.loads(pin_path.read_text())
    return check_docs_vs_pin(repo, pin) + check_pin_vs_latest(repo, pin)


def repin(repo: Path = REPO) -> int:
    src = repo / "artifacts" / "BENCH_LOCAL.json"
    dst = repo / "artifacts" / "BENCH_PINNED.json"
    if not src.exists():
        print(f"no capture at {src} — run `python bench.py` first",
              file=sys.stderr)
        return 1
    data = json.loads(src.read_text())
    data["_pinned"] = (
        "number of record; promoted from BENCH_LOCAL.json by "
        "check_readme_numbers.py --repin. Update README/STATUS quotes to "
        "match, then commit both."
    )
    dst.write_text(json.dumps(data, indent=1) + "\n")
    print(f"pinned {src} -> {dst}; now update README/STATUS quotes")
    return 0


def main(argv: list[str]) -> int:
    if "--repin" in argv:
        return repin()
    errors = check()
    if errors:
        for e in errors:
            print(f"NUMBER DRIFT: {e}", file=sys.stderr)
        return 1
    print("README/STATUS quotes match artifacts/BENCH_PINNED.json; "
          "latest capture within tolerance of the pin")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

"""Headline-number hygiene checker (VERDICT r3 'what's weak' #3 / task 9).

README.md and STATUS.md quote bench headline figures; three rounds running
those quotes drifted from the captured artifact. This script parses the
quoted figures and diffs them against the number of record —
`artifacts/BENCH_LOCAL.json`, written by every `python bench.py` run — and
exits non-zero on any mismatch. It runs inside the test suite
(tests/test_train.py::test_readme_numbers_match_bench_artifact).

Quoting convention enforced:
  README.md : "rollout X.XX M edges/s/chip", "(Y.YY ms/span-step",
              "Z.ZZ M with the bf16", "train step W.WW M edges/s",
              "8-lane launch V.VV M"
  STATUS.md : the ```-fenced bench block with `key  value` rows.
Numbers must equal the artifact rounded to the quoted precision.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _quote_m(x: float) -> str:
    """Format edges/s as the docs' 'X.XX M' convention."""
    return f"{x / 1e6:.2f}"


def check(repo: Path = REPO) -> list[str]:
    art = repo / "artifacts" / "BENCH_LOCAL.json"
    if not art.exists():
        return [f"missing {art} — run `python bench.py` to capture it"]
    bench = json.loads(art.read_text())
    errors: list[str] = []

    readme = (repo / "README.md").read_text()
    checks = [
        (r"rollout ([\d.]+)\s*M edges/s/chip", bench["value"], "M", "README"),
        (r"\(([\d.]+) ms/span-step", bench["rollout_ms_per_step_120um"],
         "ms", "README"),
        (r"([\d.]+)\s*M with the bf16",
         bench["rollout_120um_bf16_pallas_fwd_edges_per_s"], "M", "README"),
        (r"train step ([\d.]+)\s*M edges/s", bench["train_edges_per_s"],
         "M", "README"),
        (r"8-lane launch ([\d.]+)\s*M",
         bench["rollout_batched_8x120um_edges_per_s"], "M", "README"),
        (r"hybrid 8-lane launch ([\d.]+)\s*M",
         bench["rollout_hybrid_8x120um_edges_per_s"], "M", "README"),
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
                f"{where}: quoted {quoted} {kind} vs artifact {want} {kind} "
                f"(pattern {pattern!r})"
            )

    status = (repo / "STATUS.md").read_text()
    block = re.search(r"```\n(rollout_edges_per_s_per_chip.*?)```", status,
                      re.S)
    if not block:
        errors.append("STATUS: bench block not found")
    else:
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
            ("rollout_hybrid_8x120um",
             "rollout_hybrid_8x120um_edges_per_s"),
            ("rollout_40um_edges_per_s", "rollout_40um_edges_per_s"),
            ("rollout_batched_8x120um",
             "rollout_batched_8x120um_edges_per_s"),
            ("train_edges_per_s", "train_edges_per_s"),
        ]:
            if key not in rows:
                errors.append(f"STATUS: bench row {key} missing")
                continue
            got = float(rows[key])
            want = float(bench[bkey])
            # STATUS quotes integers for rates, 2dp for ms
            tol = 0.5 if got == int(got) and want > 100 else 0.005
            if abs(got - round(want, 2)) > tol:
                errors.append(
                    f"STATUS: {key} quoted {got} vs artifact {want}")
    return errors


def main() -> int:
    errors = check()
    if errors:
        for e in errors:
            print(f"NUMBER DRIFT: {e}", file=sys.stderr)
        return 1
    print("README/STATUS headline numbers match artifacts/BENCH_LOCAL.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())

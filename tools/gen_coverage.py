"""Regenerate COVERAGE.md's registry inventory from the registry
itself (round-10 verdict task #8): the hand-written family prose can
rot as the registry grows, so the authoritative per-query map —
name, implementing module, strict-oracle vs rows-only — is GENERATED
between the markers below and asserted in sync by
tests/test_entry_contract.py-style drift checks.

Usage: python tools/gen_coverage.py          # rewrite COVERAGE.md
       python tools/gen_coverage.py --check  # exit 1 if out of date
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

BEGIN = "<!-- BEGIN GENERATED REGISTRY (tools/gen_coverage.py) -->"
END = "<!-- END GENERATED REGISTRY -->"


def generate() -> str:
    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    by_mod: dict[str, list] = {}
    for name, fn in qs.items():
        mod = fn.__module__.rsplit(".", 1)[-1]
        by_mod.setdefault(mod, []).append(name)
    lines = [
        BEGIN,
        "",
        f"Registry: **{len(qs)} queries** — "
        f"{len(oracles)} strict DuckDB oracle, "
        f"{len(qs) - len(oracles)} rows-only (justified in "
        "`tests/test_entry_contract.py`'s pinned allowlist).",
        "",
        "| module | queries | strict | rows-only queries |",
        "|---|---|---|---|",
    ]
    for mod in sorted(by_mod):
        names = sorted(by_mod[mod])
        strict = [n for n in names if n in oracles]
        rows_only = [n for n in names if n not in oracles]
        lines.append(
            f"| `{mod}` | {len(names)} | {len(strict)} | "
            + (", ".join(f"`{n}`" for n in rows_only) or "—")
            + " |"
        )
    lines += ["", "Full per-module query lists:", ""]
    for mod in sorted(by_mod):
        names = sorted(by_mod[mod])
        marks = [
            f"`{n}`" + ("" if n in oracles else " (rows-only)")
            for n in names
        ]
        lines.append(f"- **{mod}**: " + ", ".join(marks))
    lines += ["", END]
    return "\n".join(lines)


def main() -> int:
    check = "--check" in sys.argv
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "COVERAGE.md",
    )
    with open(path) as fh:
        text = fh.read()
    block = generate()
    if BEGIN in text:
        pre = text.split(BEGIN)[0]
        post = text.split(END, 1)[1]
        new = pre + block + post
    else:
        new = text.rstrip() + "\n\n## Registry inventory (generated)\n\n" + block + "\n"
    if check:
        if new != text:
            print("COVERAGE.md registry section is out of date — run "
                  "python tools/gen_coverage.py", file=sys.stderr)
            return 1
        print("COVERAGE.md registry section up to date")
        return 0
    with open(path, "w") as fh:
        fh.write(new)
    print("COVERAGE.md regenerated")
    return 0


if __name__ == "__main__":
    sys.exit(main())

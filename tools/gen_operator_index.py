"""Regenerate docs/OPERATORS.md from __ray_entry__.queries()/oracle_sql().

Usage: python tools/gen_operator_index.py
(no Ray session needed — the registry is built without executing queries)
"""
import inspect
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __ray_entry__ as entry  # noqa: E402


def first_doc_line(fn) -> str:
    doc = inspect.getdoc(fn) or ""
    if not doc and getattr(fn, "__name__", "") == "<lambda>":
        # unwrap lambdas that delegate to a named pipeline fn: take the doc
        # of the first global it calls that isn't a private helper
        for name in fn.__code__.co_names:
            if name.startswith("_") or name == "__import__":
                continue
            target = fn.__globals__.get(name)
            if target is None:
                # `__import__("mod", fromlist=[...]).attr(...)` pattern:
                # module path sits in co_consts, attr name in co_names
                for const in fn.__code__.co_consts:
                    if isinstance(const, str) and const.startswith("ctdray"):
                        try:
                            mod = __import__(const, fromlist=[name])
                            target = getattr(mod, name, None)
                        except ImportError:
                            target = None
                        if target is not None:
                            break
            tdoc = inspect.getdoc(target) if target is not None else ""
            if tdoc:
                doc = tdoc
                break
    line = doc.strip().split("\n")[0] if doc else ""
    return line


def main() -> None:
    qs = entry.queries()
    oracles = entry.oracle_sql()
    rows = []
    for name, fn in qs.items():
        kind = ("value-exact SQL" if name in oracles
                else "rows-only (model/approx)")
        rows.append((name, kind, first_doc_line(fn)))
    n_total, n_sql = len(rows), sum(1 for _, k, _ in rows if "SQL" in k)
    out = [
        "# Operator index — `__ray_entry__.queries()`",
        "",
        f"{n_total} queries; {n_sql} carry a value-exact DuckDB oracle",
        "(rows+schema+hash compared by the driver at sf0.01). The remaining",
        f"{n_total - n_sql} are model-driven / approximate families checked",
        "rows-only by the driver and pinned by pytest oracles instead",
        "(span-equality vs `ctdray.oracle`, recall floors, decode",
        "round-trips).",
        "",
        "| query | correctness | summary |",
        "|---|---|---|",
    ]
    for name, kind, summary in rows:
        out.append(f"| `{name}` | {kind} | {summary} |")
    out.append("")
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "OPERATORS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {n_total} rows ({n_sql} oracled) to docs/OPERATORS.md")


if __name__ == "__main__":
    main()

"""Regenerate SURVEY.md §8.1 (driver-contract query index) by importing
__ray_entry__ and reading each query callable's docstring — run from the
repo root after adding queries()/oracle_sql() entries."""
import importlib.util
import sys

sys.path.insert(0, ".")

spec = importlib.util.spec_from_file_location("entrymod", "__ray_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
queries = mod.queries()
oracled = set(mod.oracle_sql().keys())

lines = [
    "### 8.1 Driver-contract query index (round 3)",
    "",
    "Every `queries()` key, its one-line semantics (from the function's",
    "docstring), and whether the driver value-matches it against a DuckDB",
    "oracle (`SQL`) or checks rows/schema only (`rows`).",
    "",
    "| query | oracle | semantics |",
    "|---|---|---|",
]
for name in sorted(queries):
    d = " ".join((queries[name].__doc__ or "").split()).split(". ")[0].rstrip(".")
    if len(d) > 260:
        d = d[:257] + "..."
    lines.append(f"| `{name}` | {'SQL' if name in oracled else 'rows'} | {d} |")

survey = open("SURVEY.md").read()
open("SURVEY.md", "w").write(survey[: survey.index("### 8.1")] + "\n".join(lines) + "\n")
print(f"{len(queries)} queries, {len(oracled)} oracled")

import sys
sys.path.insert(0, ".")
"""Regenerate SURVEY.md §8.1 (driver-contract query index) from
__ray_entry__.py by AST — run after adding queries()/oracle_sql() entries."""
import ast
import re

src = open("__ray_entry__.py").read()
tree = ast.parse(src)
docs = {}
for node in ast.walk(tree):
    if isinstance(node, ast.FunctionDef) and node.name.startswith("_q_"):
        d = ast.get_docstring(node) or ""
        docs[node.name] = " ".join(d.split())

# query name -> function name from the queries() dict literal
qmap = dict(re.findall(r'"([a-z0-9_]+)": (_q_[a-z0-9_]+),', src))
# flagship/pagexml entries may map to non-_q_ callables; scrape them too
qmap.update(
    {k: v for k, v in re.findall(r'"([a-z0-9_]+)": (\w+),', src) if k not in qmap and v.startswith("_q_")}
)
import importlib.util
spec = importlib.util.spec_from_file_location("entrymod", "__ray_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
queries = mod.queries()
oracled = set(mod.oracle_sql().keys())

lines = [
    "### 8.1 Driver-contract query index (round 2 final)",
    "",
    "Every `queries()` key, its one-line semantics (from the function's",
    "docstring), and whether the driver value-matches it against a DuckDB",
    "oracle (`SQL`) or checks rows/schema only (`rows`).",
    "",
    "| query | oracle | semantics |",
    "|---|---|---|",
]
for name in sorted(queries):
    fn = queries[name]
    d = " ".join((fn.__doc__ or "").split())
    # first sentence-ish, trimmed
    d = d.split(". ")[0].rstrip(".")
    if len(d) > 260:
        d = d[:257] + "..."
    flag = "SQL" if name in oracled else "rows"
    lines.append(f"| `{name}` | {flag} | {d} |")

survey = open("SURVEY.md").read()
head = survey[: survey.index("### 8.1")]
open("SURVEY.md", "w").write(head + "\n".join(lines) + "\n")
print(f"{len(queries)} queries, {len(oracled)} oracled")

#!/usr/bin/env python3
"""Generate the SURVEY per-query index table: every SparkEntry query
name -> the operator it exercises -> its verification kind (DuckDB
oracle vs rows-only golden) -> where it's defined (file:line).

Sources of truth: the query-module Scala files for definitions, the
module oracle maps for oracle coverage, Goldens.rowsOnly for the
golden set. Rerun after adding queries:
    python3 tools/query_index.py > /tmp/query_index.md
then refresh the table in SURVEY.md §2.10.
"""
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QDIR = os.path.join(REPO, "src/main/scala/graft/queries")

OP_RE = re.compile(
    r"\b((?:Dedup|Search|Knn|TextOps|Bpe|Pca|Temporal|Multimodal|"
    r"Classifier|UnigramLm|Layout|Sketches|SketchFunctions|"
    r"BpeFunctions|VectorFunctions|TextHashFunctions|GeoFunctions|"
    r"ImageOps)\.\w+)")
DEF_RE = re.compile(r'^\s*"(q_[a-z0-9_]+)"\s*->')


def module_queries(path):
    """(name, line, operator) for each query defined before the oracle
    map; oracle names from the oracle map section."""
    text = open(path).read().splitlines()
    # split at the oracle map declaration if present
    oracle_start = next((i for i, l in enumerate(text)
                         if re.search(r"val oracle\s*:", l)), len(text))
    defs, oracle_names = [], set()
    for i, line in enumerate(text):
        m = DEF_RE.match(line)
        if not m:
            continue
        name = m.group(1)
        if i >= oracle_start:
            oracle_names.add(name)
            continue
        # operator: first operator-object call within the next 25 lines
        op = None
        for j in range(i, min(i + 25, len(text))):
            om = OP_RE.search(text[j])
            if om:
                op = om.group(1)
                break
            # stop scanning at the next query definition
            if j > i and DEF_RE.match(text[j]):
                break
        defs.append((name, i + 1, op or "DataFrame composition"))
    return defs, oracle_names


def goldens():
    src = open(os.path.join(REPO, "src/main/scala/graft/Goldens.scala")).read()
    block = src.split("rowsOnly")[1].split("expected")[0]
    return set(re.findall(r'"(q_[a-z0-9_]+)"', block))


def main():
    golden = goldens()
    rows, all_oracle = [], set()
    for fn in sorted(os.listdir(QDIR)):
        if not fn.endswith(".scala"):
            continue
        defs, oracle_names = module_queries(os.path.join(QDIR, fn))
        all_oracle |= oracle_names
        for name, line, op in defs:
            rows.append((name, op, f"src/main/scala/graft/queries/{fn}:{line}"))
    print("| query | operator | verified by | defined at |")
    print("| --- | --- | --- | --- |")
    n_oracle = n_golden = 0
    for name, op, loc in sorted(rows):
        if name in golden:
            kind, n_golden = "golden (2 SF)", n_golden + 1
        elif name in all_oracle:
            kind, n_oracle = "DuckDB oracle", n_oracle + 1
        else:
            kind = "MISSING"
        print(f"| {name} | `{op}` | {kind} | `{loc}` |")
    print()
    print(f"{len(rows)} queries: {n_oracle} DuckDB-oracled, "
          f"{n_golden} rows-only golden-pinned"
          + ("" if n_oracle + n_golden == len(rows) else " — MISMATCH"))


if __name__ == "__main__":
    main()

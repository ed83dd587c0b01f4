#!/usr/bin/env python3
"""Generate the per-query coverage table in COVERAGE.md from the wiring
maps in src/main/scala/graft (the same maps SparkEntry aggregates).

One row per query: name -> family -> operators exercised (functions the
wiring lambda calls) -> kernel file. Regenerate after adding queries:

    python3 tools/gen_coverage.py

ContractSpec drift-checks the generated table against
SparkEntry.queries.keySet, so a forgotten regeneration fails `sbt test`.
"""
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SRC = REPO / "src/main/scala/graft"
COVERAGE = REPO / "COVERAGE.md"
BEGIN = "<!-- BEGIN GENERATED QUERY TABLE (tools/gen_coverage.py) -->"
END = "<!-- END GENERATED QUERY TABLE -->"

FAMILY = {
    "queries/VideoQueries.scala": "Video pipeline (reference)",
    "queries/Relational.scala": "Relational / OLAP",
    "ext/Dedup.scala": "Dedup (exact / near / cluster)",
    "ext/Similarity.scala": "ANN / similarity",
    "ext/TextAnalysis.scala": "Text analysis / retrieval",
    "ext/Lm.scala": "LM / n-gram stats",
    "ext/Curation.scala": "Curation / selection",
    "ext/Multimodal.scala": "Multimodal",
    "ext/Mixture.scala": "Mixture / datasheet",
    "ext/Sketches.scala": "Sketches / table stats",
    "sources/Jsonl.scala": "Source: JSONL",
    "sources/Partitioned.scala": "Source: partitioned layout",
    "sources/Compaction.scala": "Table maintenance",
    "sources/ZOrder.scala": "Table maintenance",
    "sources/TokenIndex.scala": "Table maintenance",
    "sources/DynamicOverwrite.scala": "Table maintenance",
    "sources/Robustness.scala": "Source: robustness",
    "streaming/StreamingGate.scala": "Streaming gate",
}

# identifiers that are plumbing, not operators
NOISE = {
    "col", "lit", "expr", "Map", "Seq", "broadcast", "Tables", "import",
    "documents", "embeddings", "lineitem", "orders", "customer", "events",
    "supplier", "part", "nation", "region", "implicits", "s", "d", "toDF",
    "orderBy", "filter", "select", "withColumn", "groupBy", "agg", "join",
    "cast", "as", "when", "concat", "split", "explode", "count", "sum",
    "min", "max", "struct", "array", "coalesce",
}


def parse_entries(text, relpath):
    """Yield (query_name, ops) from every `val queries: Map...` block."""
    m = re.search(r"val queries: Map\[String.*?\]\s*=\s*Map\(", text, re.S)
    if not m:
        return
    # the Map( block runs to the matching close paren
    depth, i = 1, m.end()
    while depth > 0 and i < len(text):
        if text[i] == "(":
            depth += 1
        elif text[i] == ")":
            depth -= 1
        i += 1
    block = text[m.end():i - 1]
    # split on top-level `"qname" ->`
    parts = re.split(r'"(q\w+)"\s*->', block)
    for name, rhs in zip(parts[1::2], parts[2::2]):
        calls = re.findall(r"([A-Za-z]\w+)(?:\s+_\b|\()", rhs)
        ops, seen = [], set()
        for c in calls:
            if c in NOISE or c in seen:
                continue
            seen.add(c)
            ops.append(c)
        # keep the leading (most-specific) calls only
        yield name, ops[:4]


def main():
    rows = []
    for f in sorted(SRC.rglob("*.scala")):
        rel = str(f.relative_to(SRC))
        fam = FAMILY.get(rel)
        text = f.read_text()
        for name, ops in parse_entries(text, rel):
            if fam is None:
                sys.exit(f"no family label for {rel} — add it to FAMILY")
            rows.append((name, fam, ops, rel))
    # numeric sort on qNN, then suffix
    def key(r):
        m = re.match(r"q(\d+)", r[0])
        return (int(m.group(1)), r[0])
    rows.sort(key=key)

    lines = [BEGIN, "",
             f"{len(rows)} gated queries (regenerate: "
             "`python3 tools/gen_coverage.py`; drift-checked by ContractSpec).",
             "",
             "| Query | Family | Operators exercised | Kernel file |",
             "|---|---|---|---|"]
    for name, fam, ops, rel in rows:
        op_s = ", ".join(f"`{o}`" for o in ops) if ops else "—"
        lines.append(f"| {name} | {fam} | {op_s} | `graft/{rel}` |")
    lines += ["", END]
    table = "\n".join(lines)

    text = COVERAGE.read_text()
    if BEGIN in text:
        pre = text[:text.index(BEGIN)]
        post = text[text.index(END) + len(END):]
        COVERAGE.write_text(pre + table + post)
    else:
        COVERAGE.write_text(text.rstrip() +
                            "\n\n## Query surface (generated)\n\n" + table + "\n")
    print(f"wrote {len(rows)} rows to {COVERAGE}")


if __name__ == "__main__":
    main()

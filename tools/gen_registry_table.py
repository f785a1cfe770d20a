#!/usr/bin/env python3
"""Regenerate the SURVEY.md normative registry table from the source of
truth (the Q(...) registrations that make up graft.Queries.all) plus the
recorded verification evidence:

  - sf0.01 gate status from a CORRECTNESS_r*.json (latest by default),
  - sf1 hash parity from an oracle_check log over /tmp/graft_sf1,
  - sf10 anchor presence by scanning BASELINE.md's sf10 sections.

Usage:
  python3 tools/gen_registry_table.py [--correctness FILE] [--sf1-log FILE]

Writes the table between the REGISTRY-TABLE markers in SURVEY.md
(in place), so the table can never drift from Queries.all without a
regeneration showing the diff.
"""
import argparse
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REG_FILES = [
    "src/main/scala/graft/ops/ConformanceScanAgg.scala",
    "src/main/scala/graft/ops/ConformanceJoins.scala",
    "src/main/scala/graft/ops/ConformanceWindows.scala",
    "src/main/scala/graft/ops/ConformanceSqlFns.scala",
    "src/main/scala/graft/etl/EtlQueries.scala",
    "src/main/scala/graft/sources/SourceQueries.scala",
    "src/main/scala/graft/streaming/StreamQueries.scala",
    "src/main/scala/graft/ext/ExtQueries.scala",
]

VAL_RE = re.compile(r'^\s*val\s+\w+\s*=\s*Q\(\s*$|^\s*val\s+\w+\s*=\s*Q\("')
NAME_RE = re.compile(r'"([a-z]\w+)"')
LINK_RE = re.compile(r'\[\[([\w.]+)\]\]')


def collect_queries():
    out = []
    for rel in REG_FILES:
        lines = open(os.path.join(ROOT, rel)).read().splitlines()
        for i, ln in enumerate(lines):
            m = re.match(r'^\s*val\s+(\w+)\s*=\s*Q\(', ln)
            if not m:
                continue
            # the declared name is the first string literal on this or
            # the next line
            nm = NAME_RE.search(ln) or NAME_RE.search(lines[i + 1])
            if not nm:
                continue
            # operator ref: first [[...]] link in the comment block above
            # (links may wrap across comment lines — join the block,
            # strip comment markers, collapse whitespace, then match)
            block = []
            for back in range(i - 1, max(i - 60, -1), -1):
                s = lines[back].strip()
                if not (s.startswith("//") or s.startswith("*") or
                        s.startswith("/*") or s == ""):
                    break
                block.append(re.sub(r"^(//|\*+/?|/\*+)\s?", "", s))
            text = re.sub(r"\s+", " ", " ".join(reversed(block)))
            links = re.findall(r"\[\[\s*([\w.\s]+?)\s*\]\]", text)
            ref = re.sub(r"\s+", "", links[0]) if links else ""
            if not ref:
                # conformance/etl modules without links: the enclosing
                # object is the operator home
                ref = os.path.basename(rel).replace(".scala", "")
            out.append({"name": nm.group(1), "file": rel, "line": i + 1,
                        "ref": ref})
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--correctness", default=None)
    ap.add_argument("--sf1-log", default=None)
    args = ap.parse_args()

    # sort NUMERICALLY on the parsed round (ADVICE r19): lexicographic
    # sort breaks at r100 ('r100' < 'r20' as strings)
    def round_of(f):
        return int(re.search(r"r(\d+)", os.path.basename(f)).group(1))

    corr_file = args.correctness or max(
        glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")), key=round_of)
    if corr_file.endswith(".log"):
        # an oracle_check.py log (builder-local gate run) instead of a
        # driver CORRECTNESS file: "ok   <name> (N rows)" lines
        corr = {}
        for ln in open(corr_file):
            m = re.match(r"(ok|FAIL)\s+(\w+)", ln.strip())
            if m:
                good = m.group(1) == "ok"
                corr[m.group(2)] = {"rows_match": good, "schema_match": good,
                                    "hash_match": good}
        # builder-local gate log: label with the round inferred from the
        # latest driver CORRECTNESS file + 1 (the round being built)
        latest = glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))
        n = round_of(max(latest, key=round_of)) if latest else 0
        corr_round = f"{n + 1}-local"
    else:
        corr = json.load(open(corr_file))
        corr_round = re.search(r"r(\d+)", os.path.basename(corr_file)).group(1)

    sf1_ok = set()
    if args.sf1_log and os.path.exists(args.sf1_log):
        for ln in open(args.sf1_log):
            m = re.match(r"ok\s+(\w+)", ln.strip())
            if m:
                sf1_ok.add(m.group(1))

    # sf10 anchors: query names appearing in BASELINE.md table rows
    # inside sections (## headers or **bold** sub-headers) that
    # mention sf10
    sf10 = set()
    in_sf10 = False
    for ln in open(os.path.join(ROOT, "BASELINE.md")):
        if ln.startswith("##") or ln.lstrip().startswith("**"):
            in_sf10 = "sf10" in ln
        if in_sf10:
            m = re.match(r"\|\s*([a-z]\w+)\s*\|", ln)
            if m:
                sf10.add(m.group(1))

    queries = collect_queries()
    names = [q["name"] for q in queries]
    assert len(names) == len(set(names)), "duplicate declared names"

    # the gate file may carry multiple entries per query (c32 x3); map
    # a query green iff every entry with that prefix is green
    def gate(name):
        entries = [v for k, v in corr.items()
                   if k == name or k.startswith(name + "#")]
        if not entries:
            return "–"
        ok = all(v.get("hash_match") or
                 (v.get("rows_match") and v.get("schema_match"))
                 for v in entries)
        n = len(entries)
        return ("ok" + (f" ×{n}" if n > 1 else "")) if ok else "FAIL"

    rows = []
    for q in queries:
        ref = q["ref"].replace("graft.", "")
        rows.append("| {name} | `{ref}` | `{file}:{line}` | {g} | {s1} | {s10} |".format(
            name=q["name"], ref=ref or "—",
            file=q["file"].replace("src/main/scala/graft/", ""),
            line=q["line"], g=gate(q["name"]),
            s1="ok" if q["name"] in sf1_ok else "–",
            s10="anchored" if q["name"] in sf10 else "–"))

    oracle_entries = sum(1 for k in corr)
    header = [
        "<!-- REGISTRY-TABLE-START (generated by tools/gen_registry_table.py — do not hand-edit) -->",
        "",
        f"**Normative registry** — {len(queries)} declared queries "
        f"(gate column: CORRECTNESS_r{corr_round}, {oracle_entries} oracle entries; "
        "sf1 column: full-suite oracle sweep over /tmp/graft_sf1; sf10 column: "
        "named anchor row in a BASELINE.md sf10 section).",
        "",
        "| query | operator | registered at | sf0.01 gate | sf1 hash | sf10 |",
        "|---|---|---|---|---|---|",
    ]
    table = "\n".join(header + rows + [
        "", "<!-- REGISTRY-TABLE-END -->"])

    survey = os.path.join(ROOT, "SURVEY.md")
    text = open(survey).read()
    pat = re.compile(
        r"<!-- REGISTRY-TABLE-START.*?REGISTRY-TABLE-END -->", re.S)
    if pat.search(text):
        text = pat.sub(lambda _: table, text)
    else:
        print("no REGISTRY-TABLE markers in SURVEY.md; printing to stdout")
        print(table)
        return
    open(survey, "w").write(text)
    print(f"wrote {len(rows)} rows into SURVEY.md "
          f"(gate=r{corr_round}, sf1={len(sf1_ok)} ok, sf10={len(sf10 & set(names))} anchored)")


if __name__ == "__main__":
    main()

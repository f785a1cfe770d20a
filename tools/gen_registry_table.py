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

# Family anchors (VERDICT r19 #7): a named BASELINE.md scale anchor whose
# MEASURED PATH contains the member query's operator stands in for the
# member's scale behavior — the composed pipelines run these stages
# end-to-end, the lifecycle anchors serve through the same index/state
# code, and the streaming c-suite shares one drain geometry (isolated
# 8-partition RocksDB session over the same events file source). The
# member row prints `via <anchor>` so the table distinguishes "anchored
# through a measured family representative" from "sf1 sweep only".
# Curated here (regenerated, never hand-edited into the table); the
# mapping is containment-based, not topical similarity.
FAMILY_ANCHOR = {
    # e35/e38 compose qualityFilter -> minhash-LSH banding -> edit-distance
    # verify -> keep-best -> cluster -> chunk over documents, end-to-end
    "e05_minhash_candidates": "e35_corpus_pipeline",
    "e15_near_dup_clusters": "e35_corpus_pipeline",
    "e25_editdist_dedup": "e35_corpus_pipeline",
    "e26_keep_best": "e35_corpus_pipeline",
    "e27_dedup_pipeline": "e35_corpus_pipeline",
    "e20_quality_filter": "e35_corpus_pipeline",
    "e29_chunking": "e35_corpus_pipeline",
    "e36_paragraph_dedup": "e38_corpus_pipeline_para",
    # BPE lifecycle: e50 = fit+encode, e51 adds pack+shard, e99 = decode
    "e48_bpe_merges": "e50_bpe_encode",
    "e45_tokenize": "e50_bpe_encode",
    "e44_vocabulary": "e50_bpe_encode",
    "e39_sequence_packing": "e51_tokenized_pack_shards",
    "e46_packed_shards": "e51_tokenized_pack_shards",
    "e42_shard_shuffle": "e51_tokenized_pack_shards",
    # the sf100-anchored incremental-dedup lifecycle folds exact-hash
    # verdicts through the same index the standalone query groups on
    "e01_dedup_exact_groups": "e52_incremental_dedup",
    # persisted ANN index lifecycles (build/serve/forget) anchored at
    # sf10/sf100 exercise the same cell-partitioned index code paths
    "e47_ann_index_serve": "e114_index_mmr_serve",
    "e81_filtered_ann": "e114_index_mmr_serve",
    "e37_ann_ivf_pq": "e114_index_mmr_serve",
    "e14_ann_ivf_topk": "e106_ann_index_forget",
    "e28_ann_ivf_large_nlist": "e106_ann_index_forget",
    "e34_ann_ivf_int8": "e106_ann_index_forget",
    # streaming micro-batch drain geometry, anchored by its two heaviest
    # members (two-store join drain; CDC apply) and the sf100 ingest pair
    "c40_stream_window": "c51_stream_stream_join",
    "c47_stream_dedup": "c51_stream_stream_join",
    "c50_stream_stateful": "c51_stream_stream_join",
    "c55_stream_transform_state": "c51_stream_stream_join",
    "c56_stream_session_timers": "c51_stream_stream_join",
    "c60_stream_static_join": "c51_stream_stream_join",
    "e43_stream_corpus_ingest": "e54_streaming_dedup_ingest",
    "e49_stream_exactly_once": "e97_streaming_mv",
    "e68_stream_kmv_distinct": "e97_streaming_mv",
    "e73_stream_kmv_daily": "e97_streaming_mv",
    # IVM: the anchored streaming/join maintenance paths contain the
    # batch partials/apply operators
    "e83_incremental_agg": "e97_streaming_mv",
    "e96_mv_rewrite": "e98_mv_filtered_rewrite",
    "e103_retractable_partials": "e105_join_view_maintenance",
    "e104_mutation_ivm_serve": "e105_join_view_maintenance",
    "e82_cdc_merge": "e100_snapshot_diff",
    # map-only text scans over the documents corpus (the native-pass
    # family whose decade ladder e16 anchors)
    "e08_token_stats": "e16_subword_classes",
    "e19_length_stats": "e16_subword_classes",
    # the one-scan column profile composes the KMV sketch path
    "e65_kmv_distinct": "e71_column_profile",
    "e67_kmv_overlap": "e71_column_profile",
}


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

    # sf10/sf100 anchors: query names appearing in BASELINE.md table rows
    # inside sections (## headers or **bold** sub-headers) that mention
    # the scale; only declared-name-shaped tokens count (header cells
    # like "| query |" must not)
    sf10, sf100 = set(), set()
    in_sf10 = in_sf100 = False
    name_row = re.compile(r"\|\s*([cde]\d+_\w+)\s*\|")
    for ln in open(os.path.join(ROOT, "BASELINE.md")):
        if ln.startswith("##") or ln.lstrip().startswith("**"):
            # boundary match (ADVICE r20): "sf10" as a substring also
            # matches "sf100", which marked sf100-only sections as sf10
            in_sf10 = re.search(r"sf10(?!\d)", ln) is not None
            in_sf100 = "sf100" in ln
        m = name_row.match(ln)
        if m:
            if in_sf10:
                sf10.add(m.group(1))
            if in_sf100:
                sf100.add(m.group(1))

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

    names_set = {q["name"] for q in queries}
    bad_fam = {k: v for k, v in FAMILY_ANCHOR.items()
               if k not in names_set or v not in names_set}
    assert not bad_fam, f"FAMILY_ANCHOR references unknown queries: {bad_fam}"

    def anchor_cell(name, named):
        if name in named:
            return "anchored"
        fam = FAMILY_ANCHOR.get(name)
        if fam and fam in named:
            return f"via {fam.split('_')[0]}"
        return "–"

    rows = []
    for q in queries:
        ref = q["ref"].replace("graft.", "")
        rows.append("| {name} | `{ref}` | `{file}:{line}` | {g} | {s1} | {s10} | {s100} |".format(
            name=q["name"], ref=ref or "—",
            file=q["file"].replace("src/main/scala/graft/", ""),
            line=q["line"], g=gate(q["name"]),
            s1="ok" if q["name"] in sf1_ok else "–",
            s10=anchor_cell(q["name"], sf10),
            s100=anchor_cell(q["name"], sf100)))

    oracle_entries = sum(1 for k in corr)
    header = [
        "<!-- REGISTRY-TABLE-START (generated by tools/gen_registry_table.py — do not hand-edit) -->",
        "",
        f"**Normative registry** — {len(queries)} declared queries "
        f"(gate column: CORRECTNESS_r{corr_round}, {oracle_entries} oracle entries; "
        "sf1 column: full-suite oracle sweep over /tmp/graft_sf1; sf10/sf100 "
        "columns: `anchored` = named anchor row in a BASELINE.md section at "
        "that scale, `via eNN` = an anchored query whose measured path "
        "contains this operator — the containment-based family map curated "
        "in tools/gen_registry_table.py).",
        "",
        "| query | operator | registered at | sf0.01 gate | sf1 hash | sf10 | sf100 |",
        "|---|---|---|---|---|---|---|",
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
    fam10 = sum(1 for n in names
                if n not in sf10 and FAMILY_ANCHOR.get(n) in sf10)
    fam100 = sum(1 for n in names
                 if n not in sf100 and FAMILY_ANCHOR.get(n) in sf100)
    print(f"wrote {len(rows)} rows into SURVEY.md "
          f"(gate=r{corr_round}, sf1={len(sf1_ok)} ok, "
          f"sf10={len(sf10 & set(names))} anchored +{fam10} via family, "
          f"sf100={len(sf100 & set(names))} anchored +{fam100} via family)")


if __name__ == "__main__":
    main()

"""q300 capstone test: the curation pipeline replayed stage-by-stage."""

from collections import defaultdict

import duckdb

from isen_projet_bigdata_a3s6_spark import queries as Q

SF = "/root/testdata/sf0.001"


def test_curation_pipeline_matches_python(spark):
    rows = Q._QUERIES["q300_curation_pipeline"](spark, SF).collect()
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text, lang, n_chars FROM "
        f"read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    # stage 1: quality gate
    kept = []
    for did, tx, lang, nc in docs:
        nw = tx.count(" ") + 1
        if nc >= 80 and nw >= 15 and nc / nw >= 3.0:
            kept.append((did, tx, lang, nc))
    # stage 2: exact dedup, canonical smallest id
    by_text = {}
    for did, tx, lang, nc in kept:
        cur = by_text.get(tx)
        if cur is None or did < cur[0]:
            by_text[tx] = (did, lang, nc)
    # stage 3: top-40 per language by (n_chars desc, doc_id)
    per_lang = defaultdict(list)
    for did, lang, nc in by_text.values():
        per_lang[lang].append((did, nc))
    selected = []
    for lang, items in per_lang.items():
        items.sort(key=lambda t: (-t[1], t[0]))
        selected.extend((did, lang, nc) for did, nc in items[:40])
    # stage 4: shard manifest
    cells = defaultdict(lambda: [0, 0, 0])
    for did, lang, nc in selected:
        c = cells[(lang, did % 4)]
        c[0] += 1
        c[1] += nc
        c[2] += (did * 1000003 + nc) % 1000000007
    got = {(r["lang"], r["shard"]): r for r in rows}
    assert set(got) == set(cells)
    for k, (n, tc, ck) in cells.items():
        r = got[k]
        assert (r["n_docs"], r["total_chars"], r["checksum"]) == (n, tc, ck)


def test_curation_pipeline_is_lazy(spark):
    # the capstone claim: one lazy plan end to end — building the frame
    # triggers no job (no InMemoryRelation/Scan ExistingRDD opacity)
    df = Q._QUERIES["q300_curation_pipeline"](spark, SF)
    plan = df._jdf.queryExecution().toString()
    assert "ExistingRDD" not in plan

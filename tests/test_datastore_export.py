"""PostgreSQL / Redis datastore sinks (SURVEY §2 S9/S10): wire-format
round-trips and bit-exact tf-idf vs a pure-python recomputation of the
reference's math (plot_a_datastore.py:253-260 / :395-411)."""

import glob
import json
import math
import os
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.ops.datastore_export import (
    ValidatingRespClient,
    export_postgres,
    export_redis,
    parse_resp,
    post_resp,
    read_postgres_copy,
    read_redis_doclens,
    read_redis_postings,
)


@pytest.fixture(scope="module")
def truth(tiny_corpus_dir, tiny_index_dir):
    """Reference tf-idf ground truth keyed by the index's docmap order."""
    from elasticsearch_ray.normalizer import make_normalizer

    text_of = {}
    for f in sorted(glob.glob(os.path.join(tiny_corpus_dir, "*.parquet"))):
        t = pq.read_table(f, columns=["url", "text"])
        text_of.update(
            zip(t.column("url").to_pylist(), t.column("text").to_pylist())
        )
    dm = pa.concat_tables(
        [pq.read_table(p)
         for p in glob.glob(os.path.join(tiny_index_dir, "docmap/*.parquet"))]
    )
    norm = make_normalizer("reference")
    tf, dl, df = {}, {}, Counter()
    for did, url in zip(
        dm.column("doc_id").to_pylist(), dm.column("url").to_pylist()
    ):
        toks = norm.tokenize(text_of[url])
        dl[did] = len(toks)
        tf[did] = Counter(toks)
        for term in tf[did]:
            df[term] += 1
    n = len(dl)
    tid_of = {term: i + 1 for i, term in enumerate(sorted(df))}
    postings = {
        (tid_of[term], str(did)): (c / dl[did]) * math.log(n / df[term])
        for did, counts in tf.items()
        for term, c in counts.items()
    }
    return {"postings": postings, "dl": dl, "df": dict(df),
            "tid_of": tid_of, "n": n}


@pytest.fixture(scope="module")
def pg_dir(tiny_index_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pg_export"))
    export_postgres(tiny_index_dir, out)
    return out


@pytest.fixture(scope="module")
def resp_dir(tiny_index_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("redis_export"))
    export_redis(tiny_index_dir, out)
    return out


def test_pg_postings_bit_exact(pg_dir, truth):
    post = read_postgres_copy(pg_dir, "postings").to_pandas()
    assert len(post) == len(truth["postings"])
    for tid, did, v in zip(post.term_id, post.doc_id, post.tf_idf):
        assert truth["postings"][(tid, did)] == v  # exact double round-trip


def test_pg_terms_and_documents(pg_dir, truth):
    terms = read_postgres_copy(pg_dir, "terms").to_pandas()
    assert dict(zip(terms.term, terms.term_id)) == truth["tid_of"]
    assert dict(zip(terms.term, terms.doc_freq)) == truth["df"]
    docs = read_postgres_copy(pg_dir, "documents").to_pandas()
    assert dict(zip(docs.doc_id, docs.doc_length)) == {
        str(k): v for k, v in truth["dl"].items()
    }


def test_pg_load_script(pg_dir):
    sql = open(os.path.join(pg_dir, "load.sql")).read()
    # the reference DDL + its post-load indexes, one \copy per part file
    for frag in ("CREATE TABLE documents", "CREATE TABLE terms",
                 "CREATE TABLE postings", "idx_postings_term",
                 "idx_postings_doc", "idx_terms_term"):
        assert frag in sql
    nparts = sum(
        len(glob.glob(os.path.join(pg_dir, t, "*.copy")))
        for t in ("documents", "terms", "postings")
    )
    assert sql.count("\\copy ") == nparts


def test_redis_postings_bit_exact(resp_dir, truth):
    rp = read_redis_postings(resp_dir).to_pandas()
    assert len(rp) == len(truth["postings"])
    term_of = {v: k for k, v in truth["tid_of"].items()}
    by_term = {(term_of[tid], did): v
               for (tid, did), v in truth["postings"].items()}
    for term, did, v in zip(rp.term, rp.doc_id, rp.tf_idf):
        assert by_term[(term, did)] == v


def test_redis_doclens_and_meta(resp_dir, truth):
    rdl = read_redis_doclens(resp_dir).to_pandas()
    assert dict(zip(rdl.doc_id, rdl.doc_length)) == {
        str(k): v for k, v in truth["dl"].items()
    }
    meta = dict()
    for argv in parse_resp(open(os.path.join(resp_dir, "meta.resp"), "rb").read()):
        meta[argv[1].decode()] = int(argv[2])
    assert meta == {"meta:num_documents": truth["n"],
                    "meta:num_terms": len(truth["df"])}


def test_redis_payloads_in_doc_order(resp_dir):
    # reference stores each postings dict in document order; ours must be
    # globally doc-ascending even when a term spans segments
    for path in glob.glob(os.path.join(resp_dir, "postings-*.resp")):
        for argv in parse_resp(open(path, "rb").read()):
            ids = [int(k) for k in json.loads(argv[2])]
            assert ids == sorted(ids)


def test_post_resp_validates_every_command(resp_dir):
    stat = post_resp(resp_dir, ValidatingRespClient)
    total = sum(
        len(parse_resp(open(p, "rb").read()))
        for p in glob.glob(os.path.join(resp_dir, "*.resp"))
    )
    assert int(stat.commands.sum()) == total > 0


def test_resume_skips_existing_parts(tiny_index_dir, pg_dir):
    before = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(pg_dir, "*", "*.copy"))
    }
    export_postgres(tiny_index_dir, pg_dir, resume=True)
    after = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(pg_dir, "*", "*.copy"))
    }
    assert before == after


def test_tombstoned_docs_excluded(tiny_corpus_dir, tmp_path_factory):
    import shutil

    from elasticsearch_ray.pipelines.build import (
        BuildConfig,
        add_tombstones,
        build_index,
    )

    idx = str(tmp_path_factory.mktemp("idx_tomb"))
    shutil.rmtree(idx, ignore_errors=True)
    build_index(tiny_corpus_dir, idx,
                BuildConfig(target_partition_rows=50, docs_per_segment=70))
    add_tombstones(idx, [0, 5, 77])
    pg = str(tmp_path_factory.mktemp("pg_tomb"))
    export_postgres(idx, pg)
    docs = read_postgres_copy(pg, "documents").to_pandas()
    post = read_postgres_copy(pg, "postings").to_pandas()
    dead = {"0", "5", "77"}
    assert not dead & set(docs.doc_id)
    assert not dead & set(post.doc_id)
    assert len(docs) == 197
    rd = str(tmp_path_factory.mktemp("rd_tomb"))
    export_redis(idx, rd)
    assert not dead & set(read_redis_postings(rd).to_pandas().doc_id)
    rdl = read_redis_doclens(rd).to_pandas()
    assert not dead & set(rdl.doc_id) and len(rdl) == 197


def test_multi_shard_df_global_matches_single(tiny_corpus_dir, pg_dir,
                                              resp_dir, tmp_path_factory,
                                              monkeypatch):
    """term_id assignment and range exports must be shard-layout-invariant:
    an index whose df_global is split into many shards exports
    byte-identical COPY/RESP payload CONTENT (term_id = global rank via
    per-shard base offsets; Redis ranges sub-split per shard)."""
    from elasticsearch_ray.pipelines import build as build_mod
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index

    monkeypatch.setattr(build_mod, "DF_SHARD_ROWS", 100)
    idx = str(tmp_path_factory.mktemp("idx_msh"))
    build_index(tiny_corpus_dir, idx,
                BuildConfig(target_partition_rows=50, docs_per_segment=70))
    from elasticsearch_ray.ops.datastore_export import _df_shard_plan

    plan = _df_shard_plan(idx)
    assert len(plan) > 5, "monkeypatch failed to force multi-shard df_global"

    pg2 = str(tmp_path_factory.mktemp("pg_msh"))
    export_postgres(idx, pg2)
    for table in ("postings", "terms", "documents"):
        a = read_postgres_copy(pg_dir, table).to_pandas()
        b = read_postgres_copy(pg2, table).to_pandas()
        cols = list(a.columns)
        assert a.sort_values(cols).values.tolist() == \
            b.sort_values(cols).values.tolist(), table

    rd2 = str(tmp_path_factory.mktemp("rd_msh"))
    export_redis(idx, rd2)
    a = read_redis_postings(resp_dir).to_pandas().sort_values(
        ["term", "doc_id"])
    b = read_redis_postings(rd2).to_pandas().sort_values(["term", "doc_id"])
    assert a.values.tolist() == b.values.tolist()


def test_zlib_codec_index_exports(tiny_corpus_dir, pg_dir, tmp_path_factory):
    """decode_rows' zlib branch: a zlib-codec index exports the same
    postings values as the vbyte one."""
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index

    idx = str(tmp_path_factory.mktemp("idx_zlib"))
    build_index(
        tiny_corpus_dir, idx,
        BuildConfig(target_partition_rows=50, docs_per_segment=70,
                    codec="zlib"),
    )
    pgz = str(tmp_path_factory.mktemp("pg_zlib"))
    export_postgres(idx, pgz)
    rdz = str(tmp_path_factory.mktemp("rd_zlib"))
    export_redis(idx, rdz)
    a = read_postgres_copy(pg_dir, "postings").to_pandas().sort_values(
        ["term_id", "doc_id"])
    b = read_postgres_copy(pgz, "postings").to_pandas().sort_values(
        ["term_id", "doc_id"])
    assert a.values.tolist() == b.values.tolist()
    r = read_redis_postings(rdz).to_pandas()
    assert len(r) == len(b)


def test_exports_deterministic(tiny_index_dir, pg_dir, resp_dir,
                               tmp_path_factory):
    import hashlib

    def digest(root, pat):
        h = hashlib.md5()
        for p in sorted(glob.glob(os.path.join(root, pat))):
            h.update(open(p, "rb").read())
        return h.hexdigest()

    pg2 = str(tmp_path_factory.mktemp("pg_export2"))
    export_postgres(tiny_index_dir, pg2)
    assert digest(pg2, "*/*.copy") == digest(pg_dir, "*/*.copy")
    rd2 = str(tmp_path_factory.mktemp("redis_export2"))
    export_redis(tiny_index_dir, rd2)
    assert digest(rd2, "*.resp") == digest(resp_dir, "*.resp")


def test_pg_copy_lines_text_format_escaping():
    """COPY *text* format: backslash-escape specials, no csv quoting —
    psql must decode each value back to the original term."""
    import numpy as np

    from elasticsearch_ray.ops.datastore_export import _pg_copy_lines

    terms = ['plain', 'quo"te', 'back\\slash', '\\N', 'tab\there', 'nl\nthere']
    out = _pg_copy_lines(
        [np.arange(len(terms)), np.array(terms, dtype=object)]
    ).decode()

    def copy_decode(field: str) -> str:  # the subset psql text COPY uses
        return (
            field.replace("\\t", "\t").replace("\\n", "\n")
            .replace("\\r", "\r").replace("\\\\", "\0")
            .replace("\0", "\\")
        )

    rows = [line.split("\t") for line in out.splitlines()]
    assert [copy_decode(r[1]) for r in rows] == terms
    # '\N' must never appear unescaped (COPY reads it as NULL)
    assert not any(f == "\\N" for r in rows for f in r)


def test_svg_escapes_corpus_labels(tmp_path):
    """Token labels are arbitrary corpus strings — '&'/'<' must not
    invalidate the SVG document."""
    import xml.etree.ElementTree as ET

    from elasticsearch_ray.ops.plots import _svg_barh_panels

    p = str(tmp_path / "f.svg")
    _svg_barh_panels(
        [("t&<itle", "#036", [("r&d", 5), ("<b>", 3)])], p
    )
    root = ET.parse(p).getroot()  # raises on malformed XML
    texts = [t.text for t in root.iter() if t.tag.endswith("text")]
    assert "r&d" in texts and "<b>" in texts


def test_pg_unescape_roundtrips_copy_text():
    """read_postgres_copy must reverse _pg_copy_lines's COPY-text escaping
    — a term with backslash/tab/newline/CR loads back byte-identical."""
    from elasticsearch_ray.ops.datastore_export import (
        _pg_copy_lines,
        _pg_unescape,
    )

    vals = ["plain", "a\\b", "tab\there", "new\nline", "cr\rhere",
            "\\N", "mix\\\t\n\r end"]
    ids = np.arange(len(vals), dtype=np.int64)
    raw = _pg_copy_lines([ids, np.array(vals, dtype=object)]).decode()
    got = [_pg_unescape(line.split("\t")[1]) for line in raw.splitlines()]
    assert got == vals
    # a bare \N field (psql NULL output) decodes to SQL NULL
    assert _pg_unescape("\\N") is None
    assert _pg_unescape("no_escapes") == "no_escapes"


def test_pg_resume_stamp_invalidates_on_layout_change(tiny_corpus_dir,
                                                      tmp_path_factory):
    """resume=True against a CHANGED index layout (here: a new tombstone)
    must NOT skip stale parts — the _layout.json stamp forces a full
    rewrite, so physically deleted docs vanish from a resumed export."""
    import shutil

    from elasticsearch_ray.pipelines.build import (
        BuildConfig,
        add_tombstones,
        build_index,
    )

    idx = str(tmp_path_factory.mktemp("idx_stamp"))
    shutil.rmtree(idx, ignore_errors=True)
    build_index(tiny_corpus_dir, idx,
                BuildConfig(target_partition_rows=50, docs_per_segment=70))
    pg = str(tmp_path_factory.mktemp("pg_stamp"))
    export_postgres(idx, pg)
    docs0 = read_postgres_copy(pg, "documents").to_pandas()
    assert "0" in set(docs0.doc_id)
    add_tombstones(idx, [0, 5])
    export_postgres(idx, pg, resume=True)  # stamp mismatch -> full rewrite
    docs1 = read_postgres_copy(pg, "documents").to_pandas()
    post1 = read_postgres_copy(pg, "postings").to_pandas()
    assert not {"0", "5"} & set(docs1.doc_id)
    assert not {"0", "5"} & set(post1.doc_id)
    # unchanged layout -> resume really does skip (stamp matches)
    before = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(pg, "*", "*.copy"))
    }
    export_postgres(idx, pg, resume=True)
    after = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(pg, "*", "*.copy"))
    }
    assert before == after

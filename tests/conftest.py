import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        log_to_driver=False,
    )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus_dir(tmp_path_factory):
    """200-doc deterministic webtext corpus (FIXTURES.md 'tiny' scale)."""
    from elasticsearch_ray.sources.synthetic import write_webtext

    out = str(tmp_path_factory.mktemp("webtext_tiny"))
    write_webtext(out, 200, avg_len=60, rows_per_file=100, row_group_size=25)
    return out


@pytest.fixture(scope="session")
def tiny_texts(tiny_corpus_dir):
    import pyarrow.parquet as pq

    return (
        pq.read_table(tiny_corpus_dir, columns=["text"]).column("text").to_pylist()
    )


@pytest.fixture(scope="session")
def tiny_oracle(tiny_texts):
    from elasticsearch_ray.oracle import OracleIndex

    o = OracleIndex()
    o.build(list(enumerate(tiny_texts)))
    return o


@pytest.fixture(scope="session")
def tiny_index_dir(tiny_corpus_dir, tmp_path_factory):
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index

    out = str(tmp_path_factory.mktemp("idx_tiny"))
    build_index(
        tiny_corpus_dir,
        out,
        BuildConfig(target_partition_rows=50, docs_per_segment=70),
    )
    return out


@pytest.fixture(scope="session")
def tiny_engine(tiny_index_dir):
    from elasticsearch_ray.pipelines.query import QueryEngine

    eng = QueryEngine(tiny_index_dir, num_searchers=2)
    yield eng
    eng.close()

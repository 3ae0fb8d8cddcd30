"""Driver-contract smoke: entry() produces rows with a stable schema;
every oracle key has a query; a sampled query matches its DuckDB oracle
in-process (the full audit is tools/check_oracles.py)."""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as em


def test_contract_shape():
    qs = em.queries()
    oracles = em.oracle_sql()
    assert len(qs) >= 20
    assert set(oracles) <= set(qs)
    # every SURVEY §2 scorer has at least one query
    for op in ["levenshtein", "damerau_levenshtein", "jaro", "jaro_winkler",
               "hamming", "prefix", "postfix", "ratio", "indel", "lcs_seq",
               "osa"]:
        assert any(op in k for k in qs), op


def test_entry_smoke(spark):
    df = em.entry(spark)
    assert df.count() > 0
    assert [f.name for f in df.schema.fields] == ["id", "cluster_id",
                                                  "cluster_size"]


@pytest.mark.parametrize("name", ["levenshtein", "jaro_winkler", "fingerprint"])
def test_sampled_oracle(spark, sf_dir, name):
    sdf = em.queries()[name](spark, sf_dir).toPandas()
    con = duckdb.connect()
    for t in ["customer", "supplier", "documents", "part", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")
    odf = con.execute(em.oracle_sql()[name]).fetchdf()
    key = sorted(sdf.columns)
    s = sdf[key].sort_values(by=key).reset_index(drop=True)
    o = odf[key].sort_values(by=key).reset_index(drop=True)
    assert len(s) == len(o) and len(s) > 0
    pd.testing.assert_frame_equal(s, o, check_dtype=False, atol=1e-9)

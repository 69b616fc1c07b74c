"""Degenerate full-schema corpus builder for value-level adversarial
oracle agreement.

Takes the first rows of every sf0.001 table (schema-exact by
construction — the arrow schema is reused, including events'
nanosecond timestamps) and appends rows exercising the edges the sf
generator never produces: NULL keys and measures, dangling foreign
keys, empty/whitespace/unicode strings, epoch-0 and far-future
timestamps, zero and negative and 1e12-magnitude numerics, NULL and
zero-norm embeddings.

Wrong-WIDTH embeddings are deliberately absent: the engine contract is
that those RAISE (tests/test_adversarial_embeddings.py), so they
cannot live in a corpus every query must be total over.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

_SRC = "/root/testdata/sf0.001"
_HEAD = 40  # leading well-formed rows kept per table

_EPOCH0 = 0
_FUTURE_US = 7_258_118_400_000_000  # 2200-01-01 in µs

# per-table degenerate rows; omitted keys become NULL via from_pylist
_NASTY_ROWS: dict[str, list[dict]] = {
    "region": [
        {},
        {"r_regionkey": 99, "r_name": ""},
    ],
    "nation": [
        {},
        {"n_nationkey": 99, "n_name": "Zz 既存", "n_regionkey": 98},  # dangling FK
    ],
    "customer": [
        {},
        {
            "c_custkey": 999_999,
            "c_name": "",
            "c_nationkey": 99,  # dangling FK
            "c_acctbal": -1.0e12,
            "c_mktsegment": " ",
        },
    ],
    "supplier": [
        {},
        {"s_suppkey": 999_998, "s_name": "héllo Sürplier", "s_nationkey": 99,
         "s_acctbal": 0.0},
    ],
    "part": [
        {},
        {"p_partkey": 999_997, "p_name": "", "p_brand": " ", "p_type": "既存",
         "p_size": -1, "p_retailprice": 0.0},
    ],
    "orders": [
        {},
        # duplicate (custkey, orderdate) where the MAX-orderkey row has a
        # NULL totalprice: pins the struct-wrapped arg_max/max_by dedup
        # (DuckDB's bare arg_max skips NULL values; Spark's max_by does
        # not)
        {"o_orderkey": 999_993, "o_custkey": 7, "o_orderstatus": "O",
         "o_totalprice": 111.11, "o_orderdate": 1_700_000_000_000_000,
         "o_orderpriority": "1-URGENT"},
        {"o_orderkey": 999_994, "o_custkey": 7, "o_orderstatus": "O",
         "o_totalprice": None, "o_orderdate": 1_700_000_000_000_000,
         "o_orderpriority": "1-URGENT"},
        {
            "o_orderkey": 999_991,
            "o_custkey": 999_999,  # dangling high FK
            "o_orderstatus": "",
            "o_totalprice": 0.0,
            "o_orderdate": _EPOCH0,
            "o_orderpriority": "9-ZZZ",
        },
        {
            "o_orderkey": 999_992,
            "o_custkey": None,
            "o_orderstatus": "X",
            "o_totalprice": -12.34,
            "o_orderdate": _FUTURE_US,
            "o_orderpriority": None,
        },
    ],
    "lineitem": [
        {},
        {
            "l_orderkey": 999_991,
            "l_partkey": 999_997,
            "l_suppkey": 999_998,
            "l_linenumber": 1,
            "l_quantity": 0.0,
            "l_extendedprice": -5.5,
            "l_discount": 1.0,
            "l_tax": 0.0,
            "l_returnflag": "",
            "l_linestatus": " ",
            "l_shipdate": _EPOCH0,
        },
        {
            "l_orderkey": 999_992,
            "l_partkey": None,
            "l_suppkey": None,
            "l_linenumber": 2,
            "l_quantity": 1.0e12,
            "l_extendedprice": 0.0,
            "l_discount": 0.0,
            "l_tax": 0.0,
            "l_returnflag": None,
            "l_linestatus": None,
            "l_shipdate": _FUTURE_US,
        },
    ],
    "events": [
        {},
        # negative odd id (sign-following % would drop it from a %2
        # batch split), NULL id with a real ts (tie-order and dedup
        # tiebreak edges), and a same-instant pair whose max-id record
        # carries a NULL value (the arg_max/max_by struct-wrap case)
        {"event_id": -3, "ts": 1_700_000_100_000_000, "user_id": 5,
         "event_type": "click", "value": 1.0, "props": "{}"},
        {"event_id": None, "ts": 1_700_000_100_000_000, "user_id": 5,
         "event_type": "view", "value": 2.0, "props": "{}"},
        {"event_id": 999_988, "ts": 1_700_000_200_000_000, "user_id": 6,
         "event_type": "click", "value": 3.5, "props": "{}"},
        {"event_id": 999_989, "ts": 1_700_000_200_000_000, "user_id": 6,
         "event_type": "view", "value": None, "props": "{}"},
        {"event_id": 999_990, "ts": _EPOCH0, "user_id": 999_999,
         "event_type": "", "value": 1.0e12, "props": "{bad json"},
        {"event_id": 999_991, "ts": _FUTURE_US, "user_id": None,
         "event_type": "既存", "value": -7.25, "props": ""},
    ],
    "documents": [
        {},
        {"doc_id": 999_980, "text": "", "lang": "en", "source": "src0",
         "n_chars": 0},
        {"doc_id": 999_981, "text": " ", "lang": "", "source": None,
         "n_chars": 1},
        {"doc_id": 999_982, "text": "héllo wörld 既存 データ", "lang": "zz",
         "source": "src0", "n_chars": 18},
        {"doc_id": 999_983, "text": "tok " * 2000, "lang": "en",
         "source": "srcX", "n_chars": 8000},
        # INT32-overflow probe: >2147 qualifying lines make any
        # size()*1000000 ppm computed in INT arithmetic overflow under
        # ANSI (the r08 text_gopher_quality_rules crash class)
        {"doc_id": 999_984, "text": "- bullet...\n" * 3000, "lang": "en",
         "source": "srcX", "n_chars": 36000},
    ],
    "embeddings": [
        {},
        {"vec_id": 999_970, "embedding": [0.0] * 64, "label": 0},  # zero norm
        {"vec_id": 999_971, "embedding": [1.0e6] * 64, "label": None},
        # NULL element inside the array: pins the rank-path NULL
        # exclusion (Spark windows order NULLS FIRST asc, DuckDB NULLS
        # LAST — an included NULL would shift every rank in dim 0)
        {"vec_id": 999_972, "embedding": [None] + [0.5] * 63, "label": 1},
    ],
}


def _ts_fixups(table_name: str, schema: pa.Schema, rows: list[dict]) -> list[dict]:
    """Convert µs-integer timestamp placeholders to the column's unit
    (events stores TIMESTAMP(NANOS); the TPC-H tables store µs)."""
    out = []
    for r in rows:
        r = dict(r)
        for name in r:
            f = schema.field(name)
            if pa.types.is_timestamp(f.type) and isinstance(r[name], int):
                if f.type.unit == "ns":
                    r[name] = r[name] * 1000
                elif f.type.unit == "ms":
                    r[name] = r[name] // 1000
                elif f.type.unit == "s":
                    r[name] = r[name] // 1_000_000
        out.append(r)
    return out


def write_nasty_sf(dest: str) -> str:
    """Materialize the degenerate corpus under ``dest``; returns dest."""
    os.makedirs(dest, exist_ok=True)
    for name, extra in _NASTY_ROWS.items():
        src = pq.read_table(f"{_SRC}/{name}.parquet")
        head = src.slice(0, _HEAD)
        nasty = pa.Table.from_pylist(
            _ts_fixups(name, src.schema, extra), schema=src.schema
        )
        pq.write_table(
            pa.concat_tables([head, nasty]), f"{dest}/{name}.parquet"
        )
    return dest

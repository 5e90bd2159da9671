#!/usr/bin/env python3
"""Regen-simulation writer: emits a TRANSFORMED copy of a scale-factor dir to
exercise the engine against physical-schema shapes the driver's generator
could plausibly emit on a regen (the only failure class that has ever
produced a red round — see SURVEY.md §8 "regen-simulation hardening").

Usage: python3 tools/regen_sim.py <sim> <srcSfDir> <dstDir>

Sims (each rewrites only what it names; all other tables copy through):
  widths    int32/int64 flips on id columns, DATE-typed TPC-H date columns,
            float64 embeddings
  nanosdir  TIMESTAMP(NANOS) events written as a DIRECTORY of part files
            (the r01-r05 historical shape)
  f32meas   every double measure column written as float32
  millis    TIMESTAMP(MILLIS) events + large_string text/props + int32 doc_id
  decimal   the money/measure family written as DECIMAL(12,2) and events
            `value` as DECIMAL(18,6) — the one physical type with no prior sim
  dirall    every table written as a DIRECTORY of two part files (types
            unchanged) — the df.write.parquet layout a regen would produce
  hive      events written as HIVE-PARTITIONED date=YYYY-MM-DD/part-*.parquet
            directories (partition column ONLY in directory names — the
            df.write.partitionBy layout), column ORDER reversed inside the
            events and lineitem files, and one extra unknown generator-
            metadata column appended to orders (gen_run_id string) and
            documents (source_shard int32)
  encoding  logical types unchanged, PHYSICAL encoding drift only: zstd
            compression, 1024-row row groups, dictionary encoding off,
            DataPage v2, and column statistics omitted (no min/max in the
            footer — pushdown loses pruning but must stay correct, and the
            epoch-unit probe must not depend on footer stats)
  tz        timestamp-SEMANTICS drift: every timestamp column re-tagged with
            isAdjustedToUTC=true (tz='UTC' — the flag a Spark/pandas-backed
            regen writer sets), events `ts` additionally at MILLIS; the
            underlying instants are numerically identical (pyarrow treats
            naive as UTC when attaching the zone). Exercises Spark's
            LTZ-vs-NTZ read path and DuckDB's TIMESTAMPTZ promotion.
  int96     legacy-WRITER physical drift: every timestamp column stored as
            INT96 (old Spark/Hive/Impala writers) — INT96 carries no
            logical-type annotation at all, so both engines must recover
            TimestampType from the physical type alone; values identical.
  propstruct  payload-MATERIALIZATION drift: events `props` (a JSON text
            column today) shipped as a parquet struct<k: int64> — the shape
            a generator that parses its own payloads writes. Engine reads
            it back at the canonical string width via to_json
            (Tables.normalizeWidths); the oracle's CAST(props AS JSON) is
            identity on varchar and struct→JSON otherwise.

After writing, run the FULL gate against the copy (CLAUDE.md discipline —
unit specs cannot see oracle-vs-engine width disagreements):
  sbt -batch "runMain graft.Verify <dstDir> /tmp/sim_out"
  python3 tools/diff_oracle.py <dstDir> /tmp/sim_out
"""
import os, shutil, sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# the double measure family (CLAUDE.md: canonical width DOUBLE engine-side)
MEASURES = {
    "events":   ["value"],
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    "orders":   ["o_totalprice"],
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
    "part":     ["p_retailprice"],
}


def cast_cols(t: pa.Table, casts: dict) -> pa.Table:
    for name, typ in casts.items():
        if name in t.column_names:
            i = t.schema.get_field_index(name)
            # allow_truncate: a millis regen of a micros file IS a truncation
            # (that is the shape being simulated)
            t = t.set_column(i, name,
                             pc.cast(t.column(name), typ, safe=False))
    return t


def sim_decimal(name: str, t: pa.Table) -> pa.Table:
    # money family at DECIMAL(12,2); events.value keeps 6 digits of scale so
    # the DECIMAL(27,6)-sum oracles still exercise non-trivial fractions
    casts = {}
    for c in MEASURES.get(name, []):
        casts[c] = pa.decimal128(18, 6) if c == "value" else pa.decimal128(12, 2)
    return cast_cols(t, casts)


def sim_f32meas(name: str, t: pa.Table) -> pa.Table:
    return cast_cols(t, {c: pa.float32() for c in MEASURES.get(name, [])})


def sim_widths(name: str, t: pa.Table) -> pa.Table:
    casts = {
        "documents":  {"doc_id": pa.int32(), "n_chars": pa.int32()},
        "embeddings": {"vec_id": pa.int32(), "label": pa.int64(),
                       "embedding": pa.list_(pa.float64())},
        "events":     {"event_id": pa.int32(), "user_id": pa.int32()},
        "lineitem":   {"l_orderkey": pa.int32(), "l_partkey": pa.int32(),
                       "l_suppkey": pa.int32(), "l_linenumber": pa.int64(),
                       "l_shipdate": pa.date32()},
        "orders":     {"o_orderkey": pa.int32(), "o_custkey": pa.int32(),
                       "o_orderdate": pa.date32()},
        "customer":   {"c_custkey": pa.int32(), "c_nationkey": pa.int64()},
        "supplier":   {"s_suppkey": pa.int32(), "s_nationkey": pa.int64()},
        "part":       {"p_partkey": pa.int32(), "p_size": pa.int64()},
        "nation":     {"n_nationkey": pa.int64(), "n_regionkey": pa.int64()},
        "region":     {"r_regionkey": pa.int64()},
    }.get(name, {})
    return cast_cols(t, casts)


def sim_millis(name: str, t: pa.Table) -> pa.Table:
    if name == "events":
        t = cast_cols(t, {"ts": pa.timestamp("ms"),
                          "event_type": pa.large_string(),
                          "props": pa.large_string()})
    if name == "documents":
        t = cast_cols(t, {"doc_id": pa.int32(), "text": pa.large_string()})
    return t


def sim_nanosdir(name: str, t: pa.Table) -> pa.Table:
    if name == "events":
        t = cast_cols(t, {"ts": pa.timestamp("ns")})
    return t


def sim_tz(name: str, t: pa.Table) -> pa.Table:
    # flip isAdjustedToUTC on every timestamp column; events.ts also drifts
    # to MILLIS (unit x semantics stacked — the full Spark-writer shape)
    casts = {}
    for f in t.schema:
        if pa.types.is_timestamp(f.type) and f.type.tz is None:
            unit = "ms" if (name, f.name) == ("events", "ts") else f.type.unit
            casts[f.name] = pa.timestamp(unit, tz="UTC")
        elif pa.types.is_timestamp(f.type) and f.type.tz is not None:
            casts[f.name] = pa.timestamp(f.type.unit)  # the reverse flip
    return cast_cols(t, casts)


def sim_propstruct(name: str, t: pa.Table) -> pa.Table:
    if name != "events" or "props" not in t.column_names:
        return t
    import json
    vals = t.column("props").to_pylist()
    structs = [None if v is None else {"k": json.loads(v).get("k")}
               for v in vals]
    arr = pa.array(structs, pa.struct([("k", pa.int64())]))
    return t.set_column(t.schema.get_field_index("props"), "props", arr)


def reverse_cols(t: pa.Table) -> pa.Table:
    return t.select(list(reversed(t.column_names)))


def sim_hive(name: str, t: pa.Table) -> pa.Table:
    # column-ORDER permutation on the two widest fact tables: both engines
    # must read by NAME, never position
    if name in ("events", "lineitem"):
        t = reverse_cols(t)
    # unknown generator-metadata columns a regen could plausibly append;
    # the engine must ignore what it does not know
    if name == "orders":
        t = t.append_column("gen_run_id",
                            pa.array(["r10-sim"] * t.num_rows, pa.string()))
    if name == "documents":
        t = t.append_column(
            "source_shard",
            pc.cast(pc.subtract(
                t.column("doc_id"),
                pc.multiply(pc.divide(t.column("doc_id"), 7), 7)), pa.int32()))
    return t


def write_hive_events(t: pa.Table, dst_path: str):
    """date=YYYY-MM-DD/part-*.parquet layout: the partition value lives ONLY
    in the directory name (write_to_dataset drops the partition column from
    the files), exactly what df.write.partitionBy('date') produces."""
    shutil.rmtree(dst_path, ignore_errors=True)
    ts = t.column("ts")
    if pa.types.is_timestamp(ts.type):
        day_src = ts
    else:
        # int64 epoch (e.g. composed after nanosdir): magnitude-infer the unit
        # like Tables.inferLongEpochUnit — a blind micros cast on a nanos
        # column produces ~year-56000 partition directories
        mx = pc.max(ts).as_py() or 0
        unit = ("ns" if mx >= 30_000_000_000_000_000 else
                "us" if mx >= 30_000_000_000_000 else
                "ms" if mx >= 30_000_000_000 else "s")
        day_src = ts.cast(pa.timestamp(unit))
    day = pc.strftime(day_src, "%Y-%m-%d")
    t = t.append_column("date", day)
    pq.write_to_dataset(t, root_path=dst_path, partition_cols=["date"],
                        basename_template="part-{i}.parquet")


SIMS = {"decimal": sim_decimal, "f32meas": sim_f32meas, "widths": sim_widths,
        "millis": sim_millis, "nanosdir": sim_nanosdir,
        "dirall": lambda name, t: t, "hive": sim_hive,
        "encoding": lambda name, t: t, "tz": sim_tz,
        "int96": lambda name, t: t, "propstruct": sim_propstruct}

# physical writer-option drift for the `encoding` sim (logical schema
# untouched — everything here lives below the type system)
ENCODING_OPTS = dict(compression="zstd", row_group_size=1024,
                     use_dictionary=False, data_page_version="2.0",
                     write_statistics=False)


def main():
    sim, src, dst = sys.argv[1], sys.argv[2], sys.argv[3]
    fn = SIMS[sim]
    os.makedirs(dst, exist_ok=True)
    for tbl in TABLES:
        src_path = f"{src}/{tbl}.parquet"
        out = fn(tbl, pq.read_table(src_path))
        dst_path = f"{dst}/{tbl}.parquet"
        if sim == "dirall":
            shutil.rmtree(dst_path, ignore_errors=True)
            os.makedirs(dst_path)
            n = max(1, out.num_rows // 2)
            pq.write_table(out.slice(0, n), f"{dst_path}/part-000.parquet")
            if out.num_rows > n:
                pq.write_table(out.slice(n), f"{dst_path}/part-001.parquet")
            print(f"[sim:{sim}] {tbl}: directory of parts ({out.num_rows} rows)")
            continue
        if sim == "hive" and tbl == "events":
            write_hive_events(out, dst_path)
            n_dirs = len([d for d in os.listdir(dst_path) if d.startswith("date=")])
            print(f"[sim:{sim}] {tbl}: hive-partitioned ({n_dirs} date dirs, "
                  f"{out.num_rows} rows)")
            continue
        if sim == "nanosdir" and tbl == "events":
            # directory-of-parts layout (r01-r05 shape): two part files
            shutil.rmtree(dst_path, ignore_errors=True)
            os.makedirs(dst_path)
            n = out.num_rows // 2
            pq.write_table(out.slice(0, n), f"{dst_path}/part-000.parquet")
            pq.write_table(out.slice(n), f"{dst_path}/part-001.parquet")
        elif sim == "encoding":
            pq.write_table(out, dst_path, **ENCODING_OPTS)
        elif sim == "int96":
            # legacy-writer timestamp physical type: INT96 carries NO logical
            # type annotation at all (old Spark/Hive/Impala writers) — both
            # engines must recover TimestampType from the physical type alone
            pq.write_table(out, dst_path, use_deprecated_int96_timestamps=True)
        else:
            pq.write_table(out, dst_path)
        print(f"[sim:{sim}] {tbl}: {out.schema}".replace("\n", " | ")[:200])


if __name__ == "__main__":
    main()

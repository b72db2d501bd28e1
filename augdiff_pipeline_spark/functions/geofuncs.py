"""Column-level geometry functions over WKB columns (reference parity:
the ST_* UDFs in /root/reference/common/src/main/scala/osmesa/functions/
package.scala:27-37 — ST_AsText, ST_IsEmpty, ST_IsValid).

Each is an Arrow-batched pandas UDF around the numpy geometry kernel —
geometry decode is inherently per-value work, but the transport is
columnar and the kernel allocates nothing per row beyond the parse.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StringType

from ..geometry import wkb, wkt


@F.pandas_udf(StringType())
def st_astext(wkb_col: pd.Series) -> pd.Series:
    return wkb_col.map(lambda b: None if b is None else wkt.to_wkt(wkb.loads(bytes(b))))


@F.pandas_udf(BooleanType())
def st_is_empty(wkb_col: pd.Series) -> pd.Series:
    return wkb_col.map(lambda b: None if b is None else wkt.is_empty(wkb.loads(bytes(b))))


@F.pandas_udf(BooleanType())
def st_is_valid(wkb_col: pd.Series) -> pd.Series:
    return wkb_col.map(lambda b: None if b is None else wkt.is_valid(wkb.loads(bytes(b))))

"""Reference-faithful value stringification at the envelope boundary.

The reference decodes MySQL wire values into dynamically-typed script values
(`row_to_map`, reference src/main.rs:442-507); everything temporal or binary
surfaces as a STRING:

  - Date(y,m,d,0,0,0,0)        -> "YYYY-MM-DD"            (src/main.rs:457)
  - Date(..,h,i,s,0)           -> "YYYY-MM-DD HH:MM:SS"   (src/main.rs:458-461)
  - Date(..,micros)            -> same + ".%06d"          (src/main.rs:462-465)
  - Time(neg,d,h,i,s,[micros]) -> "±HHH:MM:SS[.%06d]", days folded into hours
                                                          (src/main.rs:466-491)
  - Bytes                      -> UTF-8 string if valid, else UPPERCASE hex
                                                          (src/main.rs:492-501)
  - NULL                       -> null                    (src/main.rs:502)

Note the pattern-match order consequence: a DATETIME at exactly midnight with
zero micros matches the first arm and stringifies as a bare date. We reproduce
that.

All of this is pure column expressions (whole-stage codegen, no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def encode_timestamp(col: Column) -> Column:
    """TIMESTAMP -> reference DATETIME stringification (src/main.rs:457-465).
    TIMESTAMP_NTZ inputs are reinterpreted as UTC instants — lossless because
    the session timezone is pinned to UTC (session.py)."""
    col = col.cast("timestamp")
    micros = F.unix_micros(col) % F.lit(1_000_000)
    # negative remainder for pre-epoch values; normalize
    micros = F.when(micros < 0, micros + 1_000_000).otherwise(micros)
    date_only = F.date_format(col, "yyyy-MM-dd")
    with_time = F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    is_midnight = F.date_format(col, "HH:mm:ss") == F.lit("00:00:00")
    return (
        F.when((micros == 0) & is_midnight, date_only)
        .when(micros == 0, with_time)
        .otherwise(F.concat(with_time, F.format_string(".%06d", micros)))
    )


def encode_date(col: Column) -> Column:
    return F.date_format(col, "yyyy-MM-dd")


def encode_micros_of_day(total_micros: Column) -> Column:
    """Signed micros -> "±HHH:MM:SS[.%06d]" with days folded into hours
    (reference TIME handling, src/main.rs:466-491: hours = d*24 + h)."""
    sign = F.when(total_micros < 0, F.lit("-")).otherwise(F.lit(""))
    a = F.abs(total_micros)
    secs_total = F.floor(a / 1_000_000).cast("long")
    micros = (a % 1_000_000).cast("long")
    hours = F.floor(secs_total / 3600)
    mins = F.floor((secs_total % 3600) / 60)
    secs = secs_total % 60
    base = F.concat(sign, F.format_string("%02d:%02d:%02d", hours, mins, secs))
    return F.when(micros == 0, base).otherwise(
        F.concat(base, F.format_string(".%06d", micros))
    )


def encode_daytime_interval(col: Column) -> Column:
    """DAY-TO-SECOND interval -> reference TIME stringification. Casting a
    DayTimeIntervalType to long yields its total length in the interval's end
    -field units; normalize through SECOND then scale to micros."""
    secs = col.cast("interval day to second").cast("double") * 1_000_000
    return encode_micros_of_day(secs.cast("long"))


def encode_binary(col: Column) -> Column:
    """Bytes -> UTF-8 string when the bytes are valid UTF-8, else uppercase
    hex (src/main.rs:492-501). Validity is checked by round-tripping the
    lossy decode: decode/encode preserves the input iff it was valid UTF-8."""
    return F.when(F.is_valid_utf8(col), F.decode(col, "UTF-8")).otherwise(
        F.upper(F.hex(col))
    )


def encode_value(col: Column, dtype: str) -> Column:
    """Stringify one column per the reference wire-decode rules, keyed by the
    Spark SQL type string (DataFrame.dtypes)."""
    d = dtype.lower()
    if d == "timestamp" or d == "timestamp_ntz":
        return encode_timestamp(col)
    if d == "date":
        return encode_date(col)
    if d == "binary":
        return encode_binary(col)
    if d.startswith("interval day"):
        return encode_daytime_interval(col)
    # ints, floats, decimals, strings, booleans: plain cast — matches the
    # reference passing native numerics through (src/main.rs:453-456).
    return col.cast("string")

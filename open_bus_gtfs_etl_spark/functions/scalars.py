"""Reference-parity scalar functions (SURVEY.md §2.7 F1-F13) as pure
column expressions — the reference implements these as row-at-a-time
Python with exception-as-null + failure counters; here each is a
codegen'd expression whose failure mode is a typed null, countable with
a plain aggregate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# F1 — parse_stop_desc (reference load_stops_to_db.py:12-18): extract
# the city between the Hebrew markers 'עיר:' and 'רציף:', strip; any
# failure ⇒ null (the reference counts and continues).
CITY_PATTERN = r"עיר:\s*(.*?)\s*רציף:"


def parse_stop_desc_city(desc_col) -> F.Column:
    got = F.regexp_extract(desc_col, CITY_PATTERN, 1)
    return F.when(F.trim(got) == "", None).otherwise(F.trim(got))


# F2 — route_desc 3-way split (load_routes_to_db.py:41-45): exactly
# 'mkt-direction-alternative' or 3× null + counted failure.
def split_route_desc(desc_col):
    toks = F.split(desc_col, "-")
    ok = F.size(toks) == 3
    return (
        F.when(ok, F.element_at(toks, 1)).alias("route_mkt"),
        F.when(ok, F.element_at(toks, 2)).alias("route_direction"),
        F.when(ok, F.element_at(toks, 3)).alias("route_alternative"),
        (~ok).alias("route_desc_parse_failed"),
    )


# F3 — parse_gtfs_datetime (load_stop_times_to_db.py:20-39): GTFS
# seconds-since-midnight may encode hour ≥ 24 → roll into the next
# day, localize Israel time, store UTC. The reference does this through
# gtfs_kit string formatting + pytz per row; here it is interval
# arithmetic: date + seconds, then Asia/Jerusalem → UTC.
def gtfs_seconds_to_utc_timestamp(date_col, seconds_col) -> F.Column:
    local_naive = F.timestamp_seconds(
        F.unix_timestamp(date_col.cast("timestamp")) + seconds_col.cast("long")
    )
    return F.to_utc_timestamp(local_naive, "Asia/Jerusalem")


# F4 — parse_time_no_seconds (partridge_helper.py:28-48): 'HH:MM' (or
# 'HH:MM:SS') → seconds as double; blank/invalid ⇒ null. The reference
# memoizes + np.vectorize; as a column expression neither is needed.
def time_to_seconds(time_col) -> F.Column:
    t = F.trim(time_col)
    parts = F.split(t, ":")
    ok = F.size(parts).isin(2, 3) & t.rlike(r"^\d{1,2}:\d{2}(:\d{2})?$")
    secs = (
        F.element_at(parts, 1).cast("long") * 3600
        + F.element_at(parts, 2).cast("long") * 60
        + F.when(F.size(parts) == 3, F.element_at(parts, 3).cast("long")).otherwise(0)
    )
    return F.when(ok, secs.cast("double"))


# F5 — zero-pad formatting (load_stop_times_to_db.py:27)
def zpad2(col) -> F.Column:
    return F.lpad(col.cast("string"), 2, "0")


# F6 — date parse with default-today (common.py:33-39)
def parse_date_str(col) -> F.Column:
    return F.coalesce(F.to_date(col, "yyyy-MM-dd"), F.current_date())


# F7 — Airflow 'None'-string normalization (common.py:42-48)
def none_string_to_null(col) -> F.Column:
    return F.when((col == "None") | (col == ""), None).otherwise(col)


# F8 — cast with null-on-failure (the debug policy of
# load_stop_times_to_db.py:86-110); strict mode raises like the
# non-debug reference path.
def safe_int(col, strict: bool = False) -> F.Column:
    casted = col.cast("int")
    if strict:
        return F.when(col.isNotNull() & casted.isNull(),
                      F.raise_error(F.concat(F.lit("int cast failed: "), col.cast("string")))
                      ).otherwise(casted)
    return casted


# F10 — composite keys stay multi-column in Spark; provided only for
# parity with the reference's string concat keys (load_stop_times_to_db.py:120)
def composite_key(*cols) -> F.Column:
    return F.concat_ws("-", *[c.cast("string") for c in cols])


# F12 — date-range generation (idempotent_process.py:20-22)
def date_range(start_col, end_col) -> F.Column:
    return F.sequence(start_col.cast("date"), end_col.cast("date"))


# F13 — dated Y/M/D path templating (common.py:51-72)
def dated_path(date_col, prefix: str = "") -> F.Column:
    p = F.date_format(date_col, "yyyy/MM/dd")
    return F.concat(F.lit(prefix), p) if prefix else p

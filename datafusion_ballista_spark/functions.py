"""DataFusion-name → Spark function compat layer (SURVEY §2.8, §7.1 step 3).

The reference registers DataFusion's full default scalar/aggregate/window
function set (ballista/core/src/registry.rs:20-73) plus Spark-compatible
clones (docs/source/user-guide/spark-compatible-functions.md). ≥95% of that
surface is a rename of a Spark builtin; this module is the rename table.

Everything here returns built-in Column expressions (JVM-side, codegen'd) —
no Python UDFs. ``compat_fn(name)`` resolves a DataFusion name; names that
already exist in Spark resolve to themselves.

Scale note: because every alias is a builtin composition, queries written
against DataFusion names keep whole-stage codegen and pushdown — the compat
layer has zero runtime cost.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

_MICROS = 1_000_000


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def date_bin(stride_seconds: int, ts: Column | str, origin: str = "1970-01-01 00:00:00") -> Column:
    """DataFusion ``date_bin(stride, ts, origin)`` — bucket a timestamp.

    Pure integer epoch-micros math (whole-stage codegen); ``pmod`` keeps the
    floor semantics correct for timestamps before the origin. Spark-native
    alternative for streaming is ``F.window``; this form yields a plain
    column usable anywhere.
    """
    t = F.unix_micros(_col(ts))
    o = F.unix_micros(F.lit(origin).cast("timestamp"))
    stride = int(stride_seconds) * _MICROS
    return F.timestamp_micros(t - F.pmod(t - o, F.lit(stride)))


def strpos(s: Column | str, sub: str) -> Column:
    """DataFusion strpos == Spark instr (1-based, 0 when absent)."""
    return F.instr(_col(s), sub)


def array_element(arr: Column | str, idx: int) -> Column:
    """DataFusion array_element (1-based) == element_at."""
    return F.element_at(_col(arr), idx)


def array_has(arr: Column | str, v) -> Column:
    return F.array_contains(_col(arr), v)


def array_has_any(a: Column | str, b: Column | str) -> Column:
    return F.arrays_overlap(_col(a), _col(b))


def array_has_all(a: Column | str, b: Column | str) -> Column:
    """true iff every element of b is in a (no direct Spark builtin)."""
    return F.forall(_col(b), lambda x: F.array_contains(_col(a), x))


def list_extract_slice(arr: Column | str, start: int, length: int) -> Column:
    return F.slice(_col(arr), start, length)


def to_hex(c: Column | str) -> Column:
    """DataFusion to_hex(int) — lowercase, matching DataFusion/DuckDB."""
    return F.lower(F.hex(_col(c)))


def iszero(c: Column | str) -> Column:
    return _col(c) == 0


def nanvl(a: Column | str, b: Column | str) -> Column:
    return F.nanvl(_col(a), _col(b))


def arrow_typeof(c: Column | str) -> Column:
    return F.typeof(_col(c))


def gcd(a: Column | str, b: Column | str) -> Column:
    """gcd via builtin composition (Spark has no gcd builtin): largest
    divisor of both, found over a bounded sequence — fine for the small-int
    domain DataFusion's gcd targets; stays fully JVM-side."""
    a, b = F.abs(_col(a)), F.abs(_col(b))
    lo = F.least(a, b)
    divisors = F.filter(
        F.sequence(F.lit(1), F.greatest(lo, F.lit(1))),
        lambda d: (a % d == 0) & (b % d == 0),
    )
    return F.when((a == 0) & (b == 0), F.lit(0)).otherwise(
        F.when(a == 0, b).when(b == 0, a).otherwise(F.array_max(divisors))
    )


def lcm(a: Column | str, b: Column | str) -> Column:
    a, b = F.abs(_col(a)), F.abs(_col(b))
    return F.when((a == 0) | (b == 0), F.lit(0)).otherwise(a * b / gcd(a, b)).cast(
        "bigint"
    )


def try_cast(c: Column | str, t: str) -> Column:
    return _col(c).try_cast(t)


def approx_distinct(c: Column | str) -> Column:
    return F.approx_count_distinct(_col(c))


def approx_percentile_cont(c: Column | str, q: float) -> Column:
    return F.percentile_approx(_col(c), q)


def approx_median(c: Column | str) -> Column:
    return F.percentile_approx(_col(c), 0.5)


def string_agg(c: Column | str, sep: str) -> Column:
    """Order-deterministic string_agg: sorted before joining."""
    return F.array_join(F.array_sort(F.collect_list(_col(c))), sep)


# DataFusion name -> Spark-equivalent callable. Names whose Spark builtin is
# identical are listed as direct F references; compositions are the shims
# above. (registry.rs:20-73; spark-compatible-functions.md:21-95)
FUNCTIONS: dict[str, Callable[..., Column]] = {
    # string
    "btrim": F.trim,
    "char_length": F.char_length,
    "character_length": F.char_length,
    "instr": F.instr,
    "strpos": strpos,
    "position": strpos,
    "split_part": F.split_part,
    "starts_with": F.startswith,
    "ends_with": F.endswith,
    "to_hex": to_hex,
    "levenshtein": F.levenshtein,
    "find_in_set": F.find_in_set,
    "overlay": F.overlay,
    "uuid": F.uuid,
    # regex
    "regexp_like": F.regexp_like,
    "regexp_match": F.regexp_extract_all,
    "regexp_replace": F.regexp_replace,
    "regexp_count": F.regexp_count,
    "regexp_instr": F.regexp_instr,
    # math
    "power": F.pow,
    "log": F.log,
    "ln": F.log,
    "iszero": iszero,
    "nanvl": nanvl,
    "isnan": F.isnan,
    "gcd": gcd,
    "lcm": lcm,
    "try_cast": try_cast,
    "factorial": F.factorial,
    "cot": F.cot,
    "random": F.rand,
    # date/time
    "date_bin": date_bin,
    "date_part": F.date_part,
    "date_trunc": F.date_trunc,
    "to_timestamp_seconds": F.timestamp_seconds,
    "to_timestamp_micros": F.timestamp_micros,
    "to_timestamp_millis": F.timestamp_millis,
    "to_unixtime": F.unix_timestamp,
    "from_unixtime": F.from_unixtime,
    "now": F.current_timestamp,
    "today": F.current_date,
    "make_date": F.make_date,
    "to_char": F.date_format,
    # conditional / null
    "coalesce": F.coalesce,
    "nullif": F.nullif,
    "nvl": F.nvl,
    "nvl2": F.nvl2,
    "ifnull": F.ifnull,
    "greatest": F.greatest,
    "least": F.least,
    # array / list
    "make_array": F.array,
    "array_element": array_element,
    "list_element": array_element,
    "array_append": F.array_append,
    "array_prepend": F.array_prepend,
    "array_concat": F.concat,
    "array_has": array_has,
    "array_contains": array_has,
    "array_has_any": array_has_any,
    "array_has_all": array_has_all,
    "array_position": F.array_position,
    "array_remove": F.array_remove,
    "array_slice": list_extract_slice,
    "array_length": F.size,
    "cardinality": F.size,
    "array_sort": F.array_sort,
    "list_sort": F.array_sort,
    "array_distinct": F.array_distinct,
    "array_union": F.array_union,
    "array_intersect": F.array_intersect,
    "array_except": F.array_except,
    "array_to_string": F.array_join,
    "string_to_array": F.split,
    "flatten": F.flatten,
    "array_reverse": F.reverse,
    "array_empty": lambda c: F.size(_col(c)) == 0,
    "range": F.sequence,
    "generate_series": F.sequence,
    # higher-order
    "array_transform": F.transform,
    "array_filter": F.filter,
    "array_reduce": F.aggregate,
    "array_any_match": F.exists,
    "array_all_match": F.forall,
    "zip_with": F.zip_with,
    # map / struct
    "map": F.create_map,
    "map_keys": F.map_keys,
    "map_values": F.map_values,
    "map_entries": F.map_entries,
    "map_extract": F.element_at,
    "struct": F.struct,
    "named_struct": F.named_struct,
    "get_field": lambda c, f: _col(c)[f],
    # hash / crypto / encoding
    "md5": F.md5,
    "sha224": lambda c: F.sha2(_col(c), 224),
    "sha256": lambda c: F.sha2(_col(c), 256),
    "sha384": lambda c: F.sha2(_col(c), 384),
    "sha512": lambda c: F.sha2(_col(c), 512),
    "digest": lambda c, alg: F.sha2(_col(c), int(str(alg).replace("sha", ""))),
    # misc
    "arrow_typeof": arrow_typeof,
    "version": F.version,
    # aggregates
    "approx_distinct": approx_distinct,
    "approx_median": approx_median,
    "approx_percentile_cont": approx_percentile_cont,
    "array_agg": F.collect_list,
    "string_agg": string_agg,
    "mean": F.avg,
    "var": F.var_samp,
    "var_population": F.var_pop,
    "stddev": F.stddev_samp,
    "stddev_population": F.stddev_pop,
    "bit_and": F.bit_and,
    "bit_or": F.bit_or,
    "bit_xor": F.bit_xor,
    "bool_and": F.bool_and,
    "bool_or": F.bool_or,
    "median": F.median,
    "first_value": F.first,
    "last_value": F.last,
    "corr": F.corr,
    "covar": F.covar_samp,
    "covar_pop": F.covar_pop,
    "regr_slope": F.regr_slope,
    "regr_intercept": F.regr_intercept,
    "regr_r2": F.regr_r2,
    "regr_count": F.regr_count,
    "regr_avgx": F.regr_avgx,
    "regr_avgy": F.regr_avgy,
}


# Aggregate-kind names within FUNCTIONS (the reference's ListFunctions
# distinguishes scalar vs aggregate UDFs; ballista-cli/src/command.rs:44).
AGGREGATE_NAMES: frozenset[str] = frozenset(
    {
        "approx_distinct",
        "approx_median",
        "approx_percentile_cont",
        "array_agg",
        "string_agg",
        "mean",
        "var",
        "var_population",
        "stddev",
        "stddev_population",
        "bit_and",
        "bit_or",
        "bit_xor",
        "bool_and",
        "bool_or",
        "median",
        "first_value",
        "last_value",
        "corr",
        "covar",
        "covar_pop",
        "regr_slope",
        "regr_intercept",
        "regr_r2",
        "regr_count",
        "regr_avgx",
        "regr_avgy",
    }
)

# FUNCTIONS names with NO identically-named entry in Spark's own SQL
# function catalog — i.e. the names the compat shims above exist FOR.
# This is the committed expectation the SHOW FUNCTIONS oracle pins; the
# Spark side recomputes membership LIVE via catalog.functionExists, so a
# Spark-version drift in the builtin surface goes red in the gate instead
# of silently changing which names resolve (verified against pyspark
# 4.1.2, round 11).
NON_CATALOG_NAMES: frozenset[str] = frozenset(
    {
        "approx_distinct",
        "approx_median",
        "approx_percentile_cont",
        "array_all_match",
        "array_any_match",
        "array_concat",
        "array_element",
        "array_empty",
        "array_filter",
        "array_has",
        "array_has_all",
        "array_has_any",
        "array_length",
        "array_reduce",
        "array_reverse",
        "array_slice",
        "array_to_string",
        "array_transform",
        "arrow_typeof",
        "covar",
        "date_bin",
        "digest",
        "ends_with",
        "gcd",
        "generate_series",
        "get_field",
        "iszero",
        "lcm",
        "list_element",
        "list_sort",
        "make_array",
        "map_extract",
        "regexp_match",
        "sha224",
        "sha256",
        "sha384",
        "sha512",
        "starts_with",
        "stddev_population",
        "string_to_array",
        "strpos",
        "to_hex",
        "to_timestamp_micros",
        "to_timestamp_millis",
        "to_timestamp_seconds",
        "to_unixtime",
        "today",
        "try_cast",
        "var",
        "var_population",
    }
)


def compat_fn(name: str) -> Callable[..., Column]:
    """Resolve a DataFusion function name to its Spark implementation.

    Falls back to the identically-named pyspark.sql.functions builtin; raises
    KeyError with the full alias list when the name is unknown.
    """
    if name in FUNCTIONS:
        return FUNCTIONS[name]
    if hasattr(F, name):
        return getattr(F, name)
    raise KeyError(
        f"no Spark mapping for DataFusion function {name!r}; "
        f"known aliases: {sorted(FUNCTIONS)}"
    )

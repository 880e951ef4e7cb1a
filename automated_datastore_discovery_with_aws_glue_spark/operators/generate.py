"""Count-bounded synthetic data generation as native Spark plans.

Reference behavior surface (SURVEY §2 rows A4 + F17): the reference seeds
its stores with faker-built rows — exactly N individual-details items
(uuid id, gender in {Male, Female}, city;
``scripts/ddb_synthetic_data_generation/synthetic_individual_details_ddb.py:165-170``)
and N network-info items (public/private IPv4, IPv6, MAC, random 10-digit
id; ``scripts/ddb_synthetic_data_generation/synthetic_network_info_ddb.py:166-172``),
inserted one ``put_item`` at a time.

Spark-first shape: ``spark.range(n)`` (an exact-cardinality, splittable,
shuffle-free source Catalyst understands — partition pruning and count(*)
short-circuits work) projected through deterministic mixing expressions.
No Python UDF, no RNG state: every value is a pure function of
``(seed, row index)`` built from two LCG rounds (Knuth/glibc multipliers —
public constants) and ``md5`` hex, so the same rows come out on a
1000-executor cluster, any partitioning, any retry — and the exact same
SQL runs on DuckDB, which makes the generators oracle-checkable.

All intermediates stay below 2^63: the row index is reduced mod 2^31
before the first multiply, and round two runs on a value < 2^31 — safe
in engines that trap on BIGINT overflow (DuckDB) and ones that wrap
(Java), at any row count. (Beyond 2^31 rows the mix streams cycle, but
uniqueness-bearing columns come from ``md5`` over the full index.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Two LCG rounds: round 1 folds in the row index and seed, round 2
# decorrelates adjacent indexes. 2147483648 = 2^31 keeps every value
# positive so `%` agrees between Spark, DuckDB, and Python.
_MIX = (
    "(((((i % 2147483648) * 1103515245 + {salt}) % 2147483648)"
    " * 69069 + 1234567) % 2147483648)"
)

# Public city names (fixture vocabulary, not faker output).
CITIES = [
    "Springfield", "Riverton", "Fairview", "Georgetown", "Clinton",
    "Salem", "Madison", "Franklin", "Arlington", "Ashland",
    "Dover", "Oxford", "Jackson", "Milton", "Newport",
    "Bristol", "Clayton", "Dayton", "Lexington", "Milford",
    "Auburn", "Burlington", "Centerville", "Florence", "Greenville",
    "Hudson", "Kingston", "Lancaster", "Manchester", "Winchester",
    "Troy", "Vienna",
]

GENDERS = ["Male", "Female"]

# First octets that dodge every reserved IPv4 block (10/8, 127/8,
# 169.254/16, 172.16/12, 192.168/16, 224+/4) regardless of later octets.
PUBLIC_OCTETS = [23, 34, 45, 52, 64, 66, 72, 80, 96, 104,
                 128, 130, 143, 151, 160, 176, 184, 198, 203, 212]


def _mix(seed: int, salt: int) -> str:
    """One decorrelated 31-bit stream per (seed, salt)."""
    return _MIX.format(salt=seed * 2654435761 % 2147483648 + salt)


def _pick_spark(options: list[str], idx_sql: str) -> str:
    arr = ", ".join(f"'{o}'" for o in options)
    return f"element_at(array({arr}), cast({idx_sql} as int) + 1)"


def _pick_duck(options: list[str], idx_sql: str) -> str:
    arr = ", ".join(f"'{o}'" for o in options)
    return f"([{arr}])[CAST({idx_sql} AS INT) + 1]"


def _int_pick_spark(options: list[int], idx_sql: str) -> str:
    arr = ", ".join(str(o) for o in options)
    return f"element_at(array({arr}), cast({idx_sql} as int) + 1)"


def _int_pick_duck(options: list[int], idx_sql: str) -> str:
    arr = ", ".join(str(o) for o in options)
    return f"([{arr}])[CAST({idx_sql} AS INT) + 1]"


def _uuid_shape(hex32: str) -> str:
    """Format a 32-char hex string into the 8-4-4-4-12 uuid shape."""
    return (
        f"concat(substring({hex32}, 1, 8), '-', substring({hex32}, 9, 4),"
        f" '-', substring({hex32}, 13, 4), '-', substring({hex32}, 17, 4),"
        f" '-', substring({hex32}, 21, 12))"
    )


def _individual_exprs(seed: int, duck: bool) -> list[str]:
    pick = _pick_duck if duck else _pick_spark
    h = f"md5(concat('ind', ':', {seed}, ':', i))"
    gender_ix = f"{_mix(seed, 11)} % 2"
    city_ix = f"{_mix(seed, 23)} % {len(CITIES)}"
    return [
        f"{_uuid_shape(h)} AS id",
        f"{pick(GENDERS, gender_ix)} AS individual_gender",
        f"{pick(CITIES, city_ix)} AS individual_location",
    ]


def _network_exprs(seed: int, duck: bool) -> list[str]:
    ipick = _int_pick_duck if duck else _int_pick_spark
    h = f"md5(concat('net', ':', {seed}, ':', i))"
    first = ipick(PUBLIC_OCTETS, f"{_mix(seed, 31)} % {len(PUBLIC_OCTETS)}")
    o2 = f"{_mix(seed, 37)} % 256"
    o3 = f"{_mix(seed, 41)} % 256"
    o4 = f"{_mix(seed, 43)} % 254 + 1"
    p2 = f"{_mix(seed, 47)} % 256"
    p3 = f"{_mix(seed, 53)} % 256"
    p4 = f"{_mix(seed, 59)} % 254 + 1"
    ipv6 = " , ':', ".join(
        f"substring({h}, {1 + 4 * g}, 4)" for g in range(8)
    )
    mac = " , ':', ".join(
        f"substring({h}, {1 + 2 * g}, 2)" for g in range(6)
    )
    return [
        f"concat({first}, '.', {o2}, '.', {o3}, '.', {o4})"
        " AS ipv4_public",
        f"concat({ipv6}) AS ipv6",
        f"concat('10.', {p2}, '.', {p3}, '.', {p4}) AS ipv4_private",
        f"concat({mac}) AS mac_address",
        f"cast(1000000000 + {_mix(seed, 61)} % 1000000000"
        f" + cast(i % 1000 as bigint) * 2147483 as string) AS id",
    ]


def individuals(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Exactly ``n`` individual-details rows, deterministic under ``seed``."""
    df = spark.range(n).withColumnRenamed("id", "i")
    return df.selectExpr(*_individual_exprs(seed, duck=False))


def network_info(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Exactly ``n`` network-info rows, deterministic under ``seed``."""
    df = spark.range(n).withColumnRenamed("id", "i")
    return df.selectExpr(*_network_exprs(seed, duck=False))


def individuals_oracle_sql(n: int, seed: int = 42) -> str:
    cols = ",\n       ".join(_individual_exprs(seed, duck=True))
    return (
        f"SELECT {cols}\nFROM range({n}) t(i)\nORDER BY id"
    )


def network_info_oracle_sql(n: int, seed: int = 42) -> str:
    cols = ",\n       ".join(_network_exprs(seed, duck=True))
    return (
        f"SELECT {cols}\nFROM range({n}) t(i)\nORDER BY id"
    )


_GEN_N = 500
_GEN_SEED = 42


def gen_individuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing: fixed-(n, seed) individuals run, deterministic."""
    return individuals(spark, _GEN_N, _GEN_SEED).orderBy("id")


def gen_network(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing: fixed-(n, seed) network-info run, deterministic."""
    return network_info(spark, _GEN_N, _GEN_SEED).orderBy("id")


QUERIES = {
    "gen_individuals": gen_individuals,
    "gen_network": gen_network,
}

ORACLES = {
    "gen_individuals": individuals_oracle_sql(_GEN_N, _GEN_SEED),
    "gen_network": network_info_oracle_sql(_GEN_N, _GEN_SEED),
}

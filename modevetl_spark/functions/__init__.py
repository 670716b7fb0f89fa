from modevetl_spark.functions.compat import (
    davg,
    dsum,
    dsum_money,
    money,
    round_sig,
    sql_davg,
    sql_dsum,
    sql_dsum_money,
    sql_money,
)

__all__ = [
    "dsum",
    "davg",
    "dsum_money",
    "money",
    "round_sig",
    "sql_dsum",
    "sql_davg",
    "sql_dsum_money",
    "sql_money",
]

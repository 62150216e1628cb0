from flexneuart_spark.plans.entries import ORACLE_SQL, QUERIES_REG, flagship  # noqa: F401

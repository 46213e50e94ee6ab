from currency_market_pulse_spark.sources.catalog import load_table, TABLES

__all__ = ["load_table", "TABLES"]

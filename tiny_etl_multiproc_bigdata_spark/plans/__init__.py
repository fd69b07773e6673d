"""Query plans: the flagship pipeline plus the full operator registry
exposed through ``__spark_entry__.py`` (queries() / oracle_sql())."""

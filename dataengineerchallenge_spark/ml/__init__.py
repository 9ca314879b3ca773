"""MLE prediction pipelines (SURVEY.md §2.10 D6, §2.5 W5;
/root/reference/README.md:18-23):

  1. expected load (requests/min) for the next minute,
  2. session length for a given IP (user_id stands in, FIXTURES.md),
  3. unique URL visits for a given IP.

``features.py`` builds the feature frames with pure DataFrame algebra
(time-windowed running aggregates — these are DuckDB-oracled, because
features are where silent skew/leakage bugs live); ``models.py`` fits
seeded ``pyspark.ml`` regressors with the deterministic normal-equations
solver (predictions are rows-only per the driver contract).
"""

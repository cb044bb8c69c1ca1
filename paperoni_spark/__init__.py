"""paperoni_spark — PySpark-native main-content extraction engine.

A from-scratch Spark re-expression of the capabilities of
hipstermojo/paperoni (readability-style article extraction), per SURVEY.md.
"""

__version__ = "0.1.0"

"""Logical planning for retrieval/materialization.

Deliberately NO custom IR: the Spark unresolved logical plan (a DataFrame
expression tree) is the IR, and Catalyst/AQE own optimization (SURVEY.md
§3.1, §4). This package holds the DataFrame-level *policies* Spark cannot
infer: PIT strategy choice, bucket alignment, skew salting.
"""

"""Pure numpy/stdlib kernels — no Spark imports allowed here.

These are the "physical operators" of the engine (SURVEY.md §2.9). They run
inside Arrow-batched pandas UDFs on executors; keeping them Spark-free makes
them unit-testable and keeps the UDF layer thin.
"""

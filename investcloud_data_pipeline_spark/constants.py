"""Lightweight cross-layer constants.

Values shared between the streaming stage and its batch/SQL twins live
here so the batch-plans registry can interpolate them WITHOUT importing
the streaming modules (which pull in pandas/numpy and
pyspark.sql.streaming.state at import time — round-12 ADVICE: a driver
without the pandas stack must still be able to enumerate batch
queries).
"""

# Heap size of the streaming per-user top-K state class
# (streaming/stateful.py::streaming_user_topk) and its batch twin
# (plans/analytics_ext8.py::user_topk_events). One definition so
# bumping K cannot desynchronize the pair.
TOPK_K = 5

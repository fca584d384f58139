"""Pure-Python semantic core.

Spark-free functions shared by the DataFrame operators (inside Arrow-batched
UDFs) and by the test suite (as a second, independent implementation of the
reference semantics).  Everything here is deterministic and side-effect free.
"""

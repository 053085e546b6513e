"""Bit-exact pure-Python/numpy core for the five reference LSH kernels.

No Spark dependency here — this layer is validated directly against the
reference's golden sqllogictest vectors before any UDF wrapping.
"""

"""Scalar function library: geo math, callsign/idspec codecs, text analysis.

The reference outsources geo math to github.com/skypies/geo (go.mod:13);
here it is a first-class module built on Spark column expressions
(JVM-side, codegen'd) with pure-Python twins for pandas-UDF internals.
"""

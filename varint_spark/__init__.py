"""varint_spark — a PySpark-native per-column lightweight-compression engine.

Generalizes the codec capabilities of the reference C library ``mattsta/varint``
(LEB128/zig-zag varints, delta, frame-of-reference, patched FOR, RLE,
dictionary, adaptive selection — see /root/reference/src/varintAdaptive.c) into
an idiomatic Spark engine:

* pure-numpy vectorized codec kernels (``varint_spark.codecs``) — the moral
  equivalent of the reference's SIMD kernels; no per-row Python anywhere,
* a sampling-based adaptive codec selector (``varint_spark.selector``)
  mirroring the decision tree in ``varintAdaptiveSelectEncoding``
  (src/varintAdaptive.c:244-310),
* a distributed encode/decode pipeline (``varint_spark.engine``) built on
  ``repartition`` + ``applyInPandas`` with explicit skew salting,
* per-partition lineage + checkpoint/resume (``varint_spark.lineage``).

All blocks are self-describing (1-byte codec tag + LEB128 headers), like the
reference's adaptive format (src/varintAdaptive.c:325-327).
"""

__version__ = "0.1.0"

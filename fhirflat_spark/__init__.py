"""fhirflat_spark — a PySpark-native per-column lightweight-compression engine.

A from-scratch engine (NOT a port) with the encode/decode/validate/manifest
capabilities of globaldothealth/fhirflat, re-expressed Spark-first:

- columnar encode: dictionary, RLE, FSST-style sampled symbol tables,
  bit-packing, frame-of-reference, delta/front-coding, with a per-chunk
  codec auto-selector driven by sampled cardinality/run/entropy stats
  (the analog of fhirflat's ``_dense`` demotion heuristic,
  reference ``fhirflat/fhir2flat.py:56-61``);
- bit-identical decode validated by per-row sha256 equality (the analog of
  fhirflat's pydantic round-trip re-validation,
  reference ``fhirflat/resources/base.py:60-87``);
- per-partition encode manifests with checksums for checkpoint-resumable
  lineage (the analog of fhirflat's ``fhirflat.toml`` + ``sha256sums.txt``,
  reference ``fhirflat/ingest.py:381-432``);
- salted repartitioning on ``repo`` to defuse giant-repo skew (the analog of
  fhirflat's joblib process fan-out, reference ``fhirflat/ingest.py:582-594``).

All encode/decode kernels are vectorized (numpy / pyarrow compute inside
``mapInArrow`` batches); there is no per-row Python anywhere on the hot path.
"""

__version__ = "0.1.0"

from fhirflat_spark.codecs import decode_array, encode_array  # noqa: F401

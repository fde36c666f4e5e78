"""prompture_ray — a Ray-Data-native schema + constraint validation engine.

A from-scratch reimplementation of the validate-and-report core of
jhd3197/Prompture (reference at /root/reference) as a distributed table
validator over Apache Arrow batches:

- declarative field/check specs (``specs.py``) compiled to vectorized
  ``pyarrow.compute`` predicates (``stages/validate.py``)
- per-partition pass/fail verdicts + violation rows shaped like the
  reference's validation reports (reference: prompture/cli/runner.py:28-44)
- mergeable sketches (HLL / KLL / count-min / Bloom / MinHash) for
  per-column statistics (``functions/sketches.py``)
- exact + near dedup, referential anti-joins, distribution drift (PSI/KS)
- per-partition lineage/metrics checkpoints for resumable runs
  (``state/checkpoint.py``)

Everything is expressed Ray-Data-first: ``ray.data.read_parquet`` →
``map_batches`` over zero-copy Arrow batches (actor pools for stateful
stages) → ``groupby``/``aggregate`` for the wide steps → partitioned
Parquet sinks. No module in this package calls ``ray.init()``.
"""

__version__ = "0.1.0"

from prompture_ray.specs import CheckSpec, Suite, load_suite  # noqa: F401

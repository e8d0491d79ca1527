"""hpmn_tpu — a TPU-native sequential CTR engine with the capabilities of
alimamarankgroup/HPMN (SIGIR 2019, arXiv:1905.00758).

This is a from-scratch, idiomatic JAX/XLA/Pallas implementation, NOT a port:

- Hierarchical periodic GRU memory (HPMN) realized as a *hierarchy of scans*
  (layer l runs its own scan of length T/period^l), so the periodic-update
  sparsity is exploited structurally instead of masked.
- Fused Pallas TPU kernels for the GRU recurrence (time loop in-kernel,
  recurrent weights resident in VMEM) and the attentive memory readout.
- Item/category embedding tables row-sharded over a `jax.sharding.Mesh`
  "model" axis with collective exchange of looked-up rows; dense params run
  data-parallel with psum gradient exchange — all inside one pjit'd step.
- The paper's baseline encoders (GRU4Rec-style RNN, DIEN with AUGRU, RUM
  external memory, DNN, LSTM, Caser, SHAN) on the same data pipeline.

Provenance note: the reference mount at /root/reference is EMPTY (see
SURVEY.md §0); citations in docstrings therefore point at the HPMN paper
([P §x.y] = arXiv:1905.00758) and the driver spec ([B:n] = BASELINE.json
line n) rather than reference file:line.
"""

__version__ = "0.2.0"  # keep in sync with pyproject.toml

"""snark_verifier_tpu — a TPU-native SNARK verification framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`yuliakot/snark-verifier-axiom` (a Rust halo2/PLONK proof verifier over BN254
with KZG/IPA commitments, accumulation for recursive aggregation, and verifier
codegen).  The compute path here is vectorized limb arithmetic on TPU
(jit/vmap/shard_map over a device mesh); the reference's `Loader` abstraction
becomes execution modes: pure-Python oracle (debugging / KATs) vs traced JAX
(single chip or sharded mesh).

Layer map (mirrors SURVEY.md §1):
  L1 ff/ ec/ tower/ pairing/ hash/   — math core (limb fields, curves, Poseidon)
  L2 loader/                         — execution-mode abstraction
  L3 pcs/                            — KZG (GWC19 / BDFG21) + accumulation
  L4 verifier/                       — generic PLONK verifier
  L5 system/                         — protocol IR + transcripts
  L6 sdk/                            — Snark type, aggregation, helpers
     parallel/                       — mesh sharding (MSM, batch verify)
"""

__version__ = "0.1.0"

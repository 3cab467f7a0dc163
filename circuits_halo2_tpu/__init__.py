"""circuits_halo2_tpu — TPU-native zero-knowledge proof-of-solvency framework.

A ground-up JAX/XLA/Pallas re-design of the summa-dev/summa-solvency stack
(Poseidon Merkle sum tree + Halo2-PLONKish/KZG inclusion proofs), built
TPU-first:

- ``ops``      — compute kernels: BN254 field arithmetic (limb-vectorized),
                 Poseidon, NTT, Pippenger MSM, elliptic-curve ops, hashing.
- ``merkle``   — witness-side Merkle sum tree (Entry/Node/Tree), CSV ingest.
- ``models``   — PLONKish circuit IR, the MstInclusion circuit, MockProver.
- ``utils``    — SRS (ptau) loading, transcripts, serialization, calldata.
- ``parallel`` — mesh/sharding strategies for multi-chip proving.
- ``backend``  — CEX-operator API: rounds, snapshots, address ownership.
- ``contracts``— Solidity verifier generation and calldata parity helpers.
"""

__version__ = "0.1.0"

"""Diagnose the on-TPU batched-prover verification failure (VERDICT r3 #1).

Reproduces bench_suite's batch_throughput config (k=11, entry_16, U=8) and
compares the FULL transcript event stream (every absorbed point/scalar and
every squeezed challenge) of each batched user against an independent
single-user prove with the same deterministic blinding rng. The first
diverging event localizes the bad phase/kernel on the device.

Run on the real TPU (default env). One process on the tunnel. Output:
human log on stdout + scripts/diag_batch_tpu.json with the event streams.
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

from circuits_halo2_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()

from circuits_halo2_tpu.merkle.mst import MerkleSumTree  # noqa: E402
from circuits_halo2_tpu.models.mst_inclusion import MstInclusionCircuit  # noqa: E402
from circuits_halo2_tpu.models.prover import BlindingRng, prove  # noqa: E402
from circuits_halo2_tpu.models.prover_batch import prove_batch  # noqa: E402
from circuits_halo2_tpu.utils import pipeline  # noqa: E402
from circuits_halo2_tpu.utils.transcript import KeccakTranscript  # noqa: E402

USERS = int(os.environ.get("DIAG_USERS", 8))

EVENTS: dict = {}
_active_key = [None]


class RecordingTranscript(KeccakTranscript):
    """KeccakTranscript that logs every event into EVENTS[_active_key]."""

    def __init__(self, proof: bytes | None = None):
        super().__init__(proof)
        self._log = EVENTS.setdefault(_active_key[0], [])

    def common_scalar(self, value: int):
        self._log.append(("common_scalar", hex(value)))
        return super().common_scalar(value)

    def write_point(self, point):
        self._log.append(("write_point", str(point)))
        return super().write_point(point)

    def write_scalar(self, value: int):
        self._log.append(("write_scalar", hex(value)))
        return super().write_scalar(value)

    def squeeze_challenge(self) -> int:
        ch = super().squeeze_challenge()
        self._log.append(("challenge", hex(ch)))
        return ch


class MuxTranscript(RecordingTranscript):
    """For prove_batch: each construction takes the next key in sequence."""

    _queue: list = []

    def __init__(self, proof: bytes | None = None):
        if MuxTranscript._queue:
            _active_key[0] = MuxTranscript._queue.pop(0)
        super().__init__(proof)


def main():
    t_start = time.time()

    def mark(msg):
        print(f"[{time.time() - t_start:8.1f}s] {msg}", flush=True)

    mark("keygen (k=11, ptau fixture) ...")
    art = pipeline.generate_setup_artifacts(
        11, os.path.join(ROOT, "tests/fixtures_ptau_hermez-raw-11"), 4, 2, 8
    )
    vkd = art.vk.transcript_repr
    mark("keygen done")

    tree = MerkleSumTree.from_csv(os.path.join(ROOT, "tests/fixtures_csv/entry_16.csv"))
    circuits = [
        MstInclusionCircuit.init(4, 2, 8, tree.generate_proof(u % 16))
        for u in range(USERS)
    ]

    # -- single-user proves, each with a fresh default rng (bench config) ---
    singles = []
    for u in range(USERS):
        _active_key[0] = f"single{u}"
        p = prove(
            art.params, art.pk, circuits[u], art.config, circuits[u].instances(),
            rng=BlindingRng(), transcript_cls=RecordingTranscript, vk_digest=vkd,
        )
        singles.append(p)
        ok = pipeline.full_verifier(art, p, circuits[u].instances())
        mark(f"single prove u{u}: {len(p)}B verify={ok}")

    if os.environ.get("DIAG_SKIP_BATCH"):
        first_div = {}
        with open(os.environ.get("DIAG_OUT",
                                 os.path.join(HERE, "diag_single_cpu.json")),
                  "w") as f:
            json.dump({"events": dict(EVENTS), "first_divergence": {}}, f,
                      indent=1)
        mark("wrote single-prove event streams (skip batch)")
        return

    # -- batched prove ------------------------------------------------------
    MuxTranscript._queue = [f"batch{u}" for u in range(USERS)]
    batch = prove_batch(
        art.params, art.pk, circuits, art.config,
        [c.instances() for c in circuits],
        rngs=[BlindingRng() for _ in circuits],
        transcript_cls=MuxTranscript, vk_digest=vkd,
    )
    mark("batch prove done")
    for u in range(USERS):
        okb = pipeline.full_verifier(art, batch[u], circuits[u].instances())
        same = batch[u] == singles[u]
        mark(f"batch u{u}: verify={okb} bytes_match_single={same}")

    # -- event-stream diff --------------------------------------------------
    first_div = {}
    for u in range(USERS):
        a = EVENTS.get(f"single{u}", [])
        b = EVENTS.get(f"batch{u}", [])
        div = None
        for i, (ea, eb) in enumerate(zip(a, b)):
            if ea != eb:
                div = {"index": i, "single": ea, "batch": eb}
                break
        if div is None and len(a) != len(b):
            div = {"index": min(len(a), len(b)), "single": "<len %d>" % len(a),
                   "batch": "<len %d>" % len(b)}
        first_div[u] = div
        mark(f"u{u} first divergence: {div}")

    with open(os.path.join(HERE, "diag_batch_tpu.json"), "w") as f:
        json.dump({"events": {k: v for k, v in EVENTS.items()},
                   "first_divergence": first_div}, f, indent=1)
    mark("wrote scripts/diag_batch_tpu.json")


if __name__ == "__main__":
    main()

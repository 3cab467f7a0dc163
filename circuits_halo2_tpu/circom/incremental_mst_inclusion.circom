pragma circom 2.1.0;

// IVC step circuit for incremental inclusion across rounds — the source
// form of `merkle/circom_r1cs.py::build_incremental_mst_inclusion`
// (reference side module: SURVEY §2a #22,
// `zk_prover/src/circom/incremental_mst_inclusion.circom`, folded by the
// Nova example). One step consumes the running state pair and a round's
// Merkle proof and emits the advanced pair:
//
//   user_state'        = Poseidon(user_state, leafHash)
//   liabilities_state' = Poseidon(liabilities_state, rootHash)
//
// step_in / step_out are the Nova IVC state interface (z_i -> z_{i+1});
// `models/nova_fold.py` folds instances of this R1CS and
// `models/spartan.py` compresses the final accumulator.

include "../../node_modules/circomlib/circuits/poseidon.circom";
include "merkle_sum_tree.circom";

template IncrementalMstInclusion(LEVELS, N_CURRENCIES, N_BYTES) {
    signal input step_in[2];   // [user_state, liabilities_state]
    signal output step_out[2];

    signal input username;
    signal input userBalances[N_CURRENCIES];
    signal input pathElementHashes[LEVELS];
    signal input pathElementBalances[LEVELS][N_CURRENCIES];
    signal input pathIndices[LEVELS];

    // leaf hash = Poseidon(username, balances…) — 1 + N_CURRENCIES inputs
    component leaf = Poseidon(1 + N_CURRENCIES);
    leaf.inputs[0] <== username;
    for (var j = 0; j < N_CURRENCIES; j++) {
        leaf.inputs[1 + j] <== userBalances[j];
    }

    // advance the user-state chain with this round's leaf
    component userChain = Poseidon(2);
    userChain.inputs[0] <== step_in[0];
    userChain.inputs[1] <== leaf.out;

    // recompute the round's root from the inclusion path
    component inclusion = MerkleSumTreeInclusion(LEVELS, N_CURRENCIES, N_BYTES);
    inclusion.leafHash <== leaf.out;
    for (var j = 0; j < N_CURRENCIES; j++) {
        inclusion.leafBalances[j] <== userBalances[j];
    }
    for (var i = 0; i < LEVELS; i++) {
        inclusion.pathIndices[i] <== pathIndices[i];
        inclusion.pathElementHashes[i] <== pathElementHashes[i];
        for (var j = 0; j < N_CURRENCIES; j++) {
            inclusion.pathElementBalances[i][j] <== pathElementBalances[i][j];
        }
    }

    // advance the liabilities-state chain with this round's root
    component liabChain = Poseidon(2);
    liabChain.inputs[0] <== step_in[1];
    liabChain.inputs[1] <== inclusion.rootHash;

    step_out[0] <== userChain.out;
    step_out[1] <== liabChain.out;
}

component main { public [step_in] } = IncrementalMstInclusion(4, 2, 14);

pragma circom 2.1.0;

// Merkle-sum-tree inclusion, circom edition — the source form of the R1CS
// that `merkle/circom_r1cs.py` synthesizes natively (and whose constraint
// accounting tests/test_incremental.py pins). Semantics mirror the
// reference's experimental Nova side module (SURVEY §2a #22:
// `zk_prover/src/circom/merkle_sum_tree.circom`): per level, both sides'
// balances are range-checked and summed, the (current, sibling) pair is
// conditionally swapped by the path bit, and the parent hash is
// Poseidon(leftHash, leftBalances…, rightHash, rightBalances…) — NOTE this
// node-preimage layout differs from the halo2 circuit's
// H(sumL+R…, hashL, hashR) (circom Poseidon ≠ halo2 Poseidon chain).
//
// Requires circomlib (poseidon.circom, bitify.circom, mux1.circom).

include "../../node_modules/circomlib/circuits/poseidon.circom";
include "../../node_modules/circomlib/circuits/bitify.circom";
include "../../node_modules/circomlib/circuits/mux1.circom";

// Range-check two balance vectors to N_BYTES bytes and emit their sum.
template Summer(N_CURRENCIES, N_BYTES) {
    signal input balancesA[N_CURRENCIES];
    signal input balancesB[N_CURRENCIES];
    signal output sums[N_CURRENCIES];

    component rangeA[N_CURRENCIES];
    component rangeB[N_CURRENCIES];
    for (var j = 0; j < N_CURRENCIES; j++) {
        rangeA[j] = Num2Bits(8 * N_BYTES);
        rangeA[j].in <== balancesA[j];
        rangeB[j] = Num2Bits(8 * N_BYTES);
        rangeB[j].in <== balancesB[j];
        sums[j] <== balancesA[j] + balancesB[j];
    }
}

// Order (current, sibling) into (left, right) by the path bit:
// bit = 0 keeps current on the left, bit = 1 swaps.
template Swapper(N_CURRENCIES) {
    signal input bit;
    signal input currentHash;
    signal input currentBalances[N_CURRENCIES];
    signal input siblingHash;
    signal input siblingBalances[N_CURRENCIES];
    signal output leftHash;
    signal output leftBalances[N_CURRENCIES];
    signal output rightHash;
    signal output rightBalances[N_CURRENCIES];

    bit * (1 - bit) === 0;

    component muxL = Mux1();
    muxL.c[0] <== currentHash;
    muxL.c[1] <== siblingHash;
    muxL.s <== bit;
    leftHash <== muxL.out;

    component muxR = Mux1();
    muxR.c[0] <== siblingHash;
    muxR.c[1] <== currentHash;
    muxR.s <== bit;
    rightHash <== muxR.out;

    component muxBL[N_CURRENCIES];
    component muxBR[N_CURRENCIES];
    for (var j = 0; j < N_CURRENCIES; j++) {
        muxBL[j] = Mux1();
        muxBL[j].c[0] <== currentBalances[j];
        muxBL[j].c[1] <== siblingBalances[j];
        muxBL[j].s <== bit;
        leftBalances[j] <== muxBL[j].out;

        muxBR[j] = Mux1();
        muxBR[j].c[0] <== siblingBalances[j];
        muxBR[j].c[1] <== currentBalances[j];
        muxBR[j].s <== bit;
        rightBalances[j] <== muxBR[j].out;
    }
}

// Middle-node hash: Poseidon over (leftHash, leftBalances…, rightHash,
// rightBalances…) — 2·(N_CURRENCIES+1) inputs.
template Hasher(N_CURRENCIES) {
    signal input leftHash;
    signal input leftBalances[N_CURRENCIES];
    signal input rightHash;
    signal input rightBalances[N_CURRENCIES];
    signal output hash;

    component h = Poseidon(2 * (N_CURRENCIES + 1));
    h.inputs[0] <== leftHash;
    for (var j = 0; j < N_CURRENCIES; j++) {
        h.inputs[1 + j] <== leftBalances[j];
    }
    h.inputs[N_CURRENCIES + 1] <== rightHash;
    for (var j = 0; j < N_CURRENCIES; j++) {
        h.inputs[N_CURRENCIES + 2 + j] <== rightBalances[j];
    }
    hash <== h.out;
}

// Walk the path from a leaf to the root, range-checking and summing
// balances at every level; outputs the recomputed root hash.
template MerkleSumTreeInclusion(LEVELS, N_CURRENCIES, N_BYTES) {
    signal input leafHash;
    signal input leafBalances[N_CURRENCIES];
    signal input pathIndices[LEVELS];
    signal input pathElementHashes[LEVELS];
    signal input pathElementBalances[LEVELS][N_CURRENCIES];
    signal output rootHash;

    component summers[LEVELS];
    component swappers[LEVELS];
    component hashers[LEVELS];
    component rootRange[N_CURRENCIES];

    signal hashes[LEVELS + 1];
    signal balances[LEVELS + 1][N_CURRENCIES];
    hashes[0] <== leafHash;
    for (var j = 0; j < N_CURRENCIES; j++) {
        balances[0][j] <== leafBalances[j];
    }

    for (var i = 0; i < LEVELS; i++) {
        summers[i] = Summer(N_CURRENCIES, N_BYTES);
        swappers[i] = Swapper(N_CURRENCIES);
        hashers[i] = Hasher(N_CURRENCIES);

        swappers[i].bit <== pathIndices[i];
        swappers[i].currentHash <== hashes[i];
        swappers[i].siblingHash <== pathElementHashes[i];
        for (var j = 0; j < N_CURRENCIES; j++) {
            summers[i].balancesA[j] <== balances[i][j];
            summers[i].balancesB[j] <== pathElementBalances[i][j];
            swappers[i].currentBalances[j] <== balances[i][j];
            swappers[i].siblingBalances[j] <== pathElementBalances[i][j];
        }

        hashers[i].leftHash <== swappers[i].leftHash;
        hashers[i].rightHash <== swappers[i].rightHash;
        for (var j = 0; j < N_CURRENCIES; j++) {
            hashers[i].leftBalances[j] <== swappers[i].leftBalances[j];
            hashers[i].rightBalances[j] <== swappers[i].rightBalances[j];
        }

        hashes[i + 1] <== hashers[i].hash;
        for (var j = 0; j < N_CURRENCIES; j++) {
            balances[i + 1][j] <== summers[i].sums[j];
        }
    }

    // the root balances must themselves stay in range (overflow guard)
    for (var j = 0; j < N_CURRENCIES; j++) {
        rootRange[j] = Num2Bits(8 * N_BYTES);
        rootRange[j].in <== balances[LEVELS][j];
    }

    rootHash <== hashes[LEVELS];
}

"""In-process EVM-semantics execution of the reference's UNCHANGED Solidity
verifier source (the acceptance oracle of BASELINE configs 1-3): a Yul-subset
interpreter (yul.py) runs the verifier contracts' assembly blocks verbatim
with BN254 precompile shims, and verifier_vm.py wires the ShuffleVerifier
call path (contracts/solidity/test/plonk_20.js:1-225 is the reference's
equivalent hardhat flow)."""

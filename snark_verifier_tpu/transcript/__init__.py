from .poseidon_transcript import (
    PoseidonTranscript,
    PoseidonTranscriptPy,
    PoseidonTranscriptWriter,
    fq_to_fr,
)
from .evm_transcript import EvmTranscriptPy, PrecomputedChallengeTranscript

__all__ = [
    "EvmTranscriptPy",
    "PoseidonTranscript",
    "PoseidonTranscriptPy",
    "PoseidonTranscriptWriter",
    "PrecomputedChallengeTranscript",
    "fq_to_fr",
]

from .poseidon_transcript import (
    PoseidonTranscript,
    PoseidonTranscriptPy,
    PoseidonTranscriptWriter,
    fq_to_fr,
)

__all__ = [
    "PoseidonTranscript",
    "PoseidonTranscriptPy",
    "PoseidonTranscriptWriter",
    "fq_to_fr",
]

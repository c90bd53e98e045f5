"""Shared deterministic word-hash id — the single home for the smoke-run
tokenizer hash (md5[:8] mod the non-reserved vocab, shifted past the
reserved special ids). Two facades consume it: the SigLIP-text stand-in
(models/multitask._HashTokenizer, pad=1, 2 reserved) and the LM stand-in
(downstream/videoqa_run._HashTok, eos=2, 3 reserved). Keeping the hash in
one place stops the two from drifting when special-id layout changes."""

import hashlib


def hash_word_id(word: str, vocab_size: int, reserved: int) -> int:
    """Stable id in [reserved, vocab_size) for ``word``."""
    h = int(hashlib.md5(word.encode()).hexdigest()[:8], 16)
    return reserved + h % (vocab_size - reserved)

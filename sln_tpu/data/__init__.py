from sln_tpu.data.vocab import VOCAB, Vocab  # noqa: F401

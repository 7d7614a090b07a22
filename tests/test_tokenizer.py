"""CLIP BPE tokenizer golden test vs transformers.CLIPTokenizer on a
synthetic vocab (no network needed — both sides read the same
vocab.json/merges.txt)."""

import json

import numpy as np
import pytest

from tokenflow_tpu.io.tokenizer import CLIPTokenizer, _bytes_to_unicode


@pytest.fixture(scope="module")
def vocab_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok")
    chars = list(_bytes_to_unicode().values())
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
    for c in chars:
        vocab[c + "</w>"] = len(vocab)
    merges = [
        "h e", "l l", "he ll", "hell o</w>", "w o", "r l", "wo rl",
        "worl d</w>", "r u', n n", "c a", "ca t</w>",
    ]
    merges = [m for m in merges if "'" not in m]
    for m in merges:
        a, b = m.split()
        vocab[a + b] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    vp, mp = d / "vocab.json", d / "merges.txt"
    vp.write_text(json.dumps(vocab))
    mp.write_text("#version: 0.2\n" + "\n".join(merges) + "\n")
    return str(vp), str(mp)


@pytest.mark.parametrize(
    "text",
    [
        "hello world",
        "a cat, a HELLO!  world...",
        "runrun hello-world 123",
        "",
        "hello " * 60,  # forces truncation at 77
    ],
)
def test_matches_transformers(vocab_files, text):
    from transformers import CLIPTokenizer as HFTok

    vp, mp = vocab_files
    hf = HFTok(vocab_file=vp, merges_file=mp)
    ours = CLIPTokenizer(vp, mp)
    ref = hf(
        text, padding="max_length", max_length=77, truncation=True
    )["input_ids"]
    got = ours(text)
    assert got == ref, (text, got[:16], ref[:16])


def test_hash_tokenizer_shape():
    from tokenflow_tpu.io.tokenizer import HashTokenizer

    t = HashTokenizer(100)
    ids = t("some words here")
    assert len(ids) == 77
    assert ids[0] == t.bos_token_id
    assert max(ids) < 100

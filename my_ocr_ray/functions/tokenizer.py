"""Tokenize + classify kernels for text spans (NER-path analog).

Reimplements the semantics of ``NerTransform`` /
``NerConvertor.convert_text2id`` (``mmocr/datasets/pipelines/ner_transforms.py:
8-41``, ``mmocr/models/ner/convertors/ner_convertor.py:77-120``): a
vocabulary lookup maps text to id sequences with [CLS]/[SEP]/[PAD] specials,
fixed ``max_len``, attention masks; a rule-based classifier stands in for the
BERT head (deterministic, no weights in this sandbox) producing BIO-style
span labels.

The vocab is a plain dict held in actor/task state (broadcast small side,
SURVEY.md §2.4) — per-batch work is list-lookup only.
"""
from __future__ import annotations

import re

import pyarrow as pa

PAD, CLS, SEP, UNK = 0, 101, 102, 100  # BERT-convention special ids


class SpanTokenizer:
    """Vocabulary tokenizer with fixed-length id/mask output."""

    def __init__(self, vocab: dict[str, int], max_len: int = 64):
        self.vocab = vocab
        self.max_len = max_len

    @classmethod
    def from_corpus(cls, texts, max_len: int = 64, first_id: int = 1000):
        """Deterministic vocab: tokens sorted lexicographically."""
        toks = sorted({t.lower() for x in texts for t in re.findall(r"\S+", x)})
        return cls({t: first_id + i for i, t in enumerate(toks)}, max_len)

    def encode(self, text: str) -> tuple[list[int], list[int]]:
        """-> (ids, attention_mask), length == max_len.

        Layout mirrors ``convert_text2id``: [CLS] + token ids (UNK for OOV)
        truncated to max_len-2 + [SEP], then PAD."""
        toks = re.findall(r"\S+", text.lower())[: self.max_len - 2]
        ids = [CLS] + [self.vocab.get(t, UNK) for t in toks] + [SEP]
        mask = [1] * len(ids)
        pad = self.max_len - len(ids)
        return ids + [PAD] * pad, mask + [0] * pad


# rule lexicons for the deterministic classifier head
_NUM_RE = re.compile(r"^[0-9]+([.,][0-9]+)?$")
_URLISH_RE = re.compile(r"^\[\[.*\]\]$")


def classify_tokens(text: str) -> list[str]:
    """BIO-ish token labels: NUM (numeric), LINK (``[[...]]`` marker),
    WORD otherwise. Deterministic stand-in for the BERT-softmax head."""
    out = []
    for t in re.findall(r"\S+", text):
        if _NUM_RE.match(t):
            out.append("NUM")
        elif _URLISH_RE.match(t):
            out.append("LINK")
        else:
            out.append("WORD")
    return out


class TokenizeClassifyStage:
    """Actor-pool stage over span rows: adds ``token_ids``, ``attention_mask``
    and ``token_labels`` columns for text spans (media rows pass through with
    empty lists). Vocab loads once per actor from a broadcast ref."""

    def __init__(self, vocab_ref=None, vocab: dict | None = None, max_len: int = 64):
        if vocab_ref is not None:
            import ray

            vocab = ray.get(vocab_ref)
        self.tokenizer = SpanTokenizer(vocab or {}, max_len)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_col, mask_col, labels_col = [], [], []
        kinds = batch["kind"].to_pylist()
        texts = batch["text"].to_pylist()
        for kind, text in zip(kinds, texts):
            if kind == "text":
                ids, mask = self.tokenizer.encode(text)
                ids_col.append(ids)
                mask_col.append(mask)
                labels_col.append(classify_tokens(text))
            else:
                ids_col.append([])
                mask_col.append([])
                labels_col.append([])
        return (
            batch.append_column(
                "token_ids", pa.array(ids_col, pa.list_(pa.int32()))
            )
            .append_column(
                "attention_mask", pa.array(mask_col, pa.list_(pa.int8()))
            )
            .append_column(
                "token_labels", pa.array(labels_col, pa.list_(pa.string()))
            )
        )

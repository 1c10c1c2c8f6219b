"""Shared flattened-token n-gram construction for Arrow-batched operators.

One tokenize pass over a batch of documents, n-grams built from shifted
views of the flattened token stream — used by both ``dedup.shingles`` and
``text.winnow_fingerprints`` so the windowing/validity edge cases live in
exactly one place.
"""
from __future__ import annotations

import numpy as np


def flat_ngrams(pdf, col: str, n: int, word_re: str):
    """Tokenize ``pdf[col]`` (lowercased ``word_re`` matches) and build all
    n-gram strings.  Returns ``(doc_idx, ngrams, valid)`` where ``ngrams``
    is an object array of space-joined n-grams starting at each flat token
    position, ``doc_idx`` maps each start to its batch row, and ``valid``
    marks starts whose n tokens all fall inside one document.  Returns
    None when the batch holds fewer than ``n`` tokens in total."""
    split = pdf[col].fillna("").str.lower().str.findall(word_re)
    lens = split.str.len().to_numpy()
    total = int(lens.sum())
    if total < n:
        return None
    # object dtype: elementwise python-str concat (a fixed-width <U array
    # would reject the ufunc and copy-pad every widen)
    flat = np.concatenate(split.to_numpy()).astype(object)
    doc_idx = np.repeat(np.arange(len(pdf)), lens)
    m = total - n + 1
    valid = doc_idx[:m] == doc_idx[n - 1:]
    ng = flat[:m]
    for j in range(1, n):  # n-1 vectorized object-string concats
        ng = ng + " "
        ng = ng + flat[j:m + j]
    return doc_idx[:m], ng, valid

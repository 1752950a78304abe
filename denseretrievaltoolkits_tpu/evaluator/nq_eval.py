"""DPR-style answer-string matching + top-k accuracy CLI.

Re-implementation of the reference ``DRT/evaluator/nq_eval.py`` protocol:
NFD-normalize, regex word-tokenize (unicode letters/digits/marks, else any
non-space char), then slide the answer token sequence over the passage tokens
(:145-218).  The relevance criterion for NQ/WQ/TriviaQA/SQuAD retrieval
evaluation (used at ``trainer.py:310``).

This is intentionally host-side string work — variable-length, branchy, and
tiny next to corpus encoding — exactly what should NOT go on the TPU.
"""

from __future__ import annotations

import argparse
import json
import re
import unicodedata
from typing import List, Sequence

import regex as _regex


class SimpleTokenizer:
    """Regex word tokenizer matching the DPR evaluation convention
    (reference nq_eval.py:145-184)."""

    ALPHA_NUM = r"[\p{L}\p{N}\p{M}]+"
    NON_WS = r"[^\p{Z}\p{C}]"

    def __init__(self):
        self._regexp = _regex.compile(
            f"({self.ALPHA_NUM})|({self.NON_WS})",
            flags=_regex.IGNORECASE + _regex.UNICODE + _regex.MULTILINE,
        )

    def tokenize(self, text: str) -> "Tokens":
        return Tokens([m.group() for m in self._regexp.finditer(text)])


class Tokens:
    """Minimal token-list wrapper (reference nq_eval.py:15-51 surface)."""

    def __init__(self, words: List[str]):
        self._words = words

    def __len__(self):
        return len(self._words)

    def words(self, uncased: bool = False) -> List[str]:
        return [w.lower() for w in self._words] if uncased else list(self._words)

    def slice(self, i=None, j=None) -> "Tokens":
        return Tokens(self._words[i:j])


_DEFAULT_TOKENIZER = SimpleTokenizer()


def _normalize(text: str) -> str:
    return unicodedata.normalize("NFD", text)


def regex_match(text: str, pattern: str) -> bool:
    """True iff the regex pattern occurs in the text (reference :187-196)."""
    try:
        compiled = re.compile(pattern, flags=re.IGNORECASE + re.UNICODE + re.MULTILINE)
    except re.error:
        return False
    return compiled.search(text) is not None


def has_answers(
    text: str,
    answers: Sequence[str],
    tokenizer: SimpleTokenizer = None,
    regex: bool = False,
) -> bool:
    """True iff any answer occurs in the passage (token-sequence or regex match,
    reference nq_eval.py:203-218)."""
    tokenizer = tokenizer or _DEFAULT_TOKENIZER
    text = _normalize(text)
    if regex:
        return any(regex_match(text, _normalize(ans)) for ans in answers)
    words = tokenizer.tokenize(text).words(uncased=True)
    for ans in answers:
        ans_words = tokenizer.tokenize(_normalize(ans)).words(uncased=True)
        if not ans_words:
            continue
        for i in range(0, len(words) - len(ans_words) + 1):
            if ans_words == words[i : i + len(ans_words)]:
                return True
    return False


def evaluate_retrieval(retrieval_file: str, topk: Sequence[int], regex: bool = False) -> dict:
    """Top-k answer accuracy over a retrieval JSON
    {qid: {answers: [...], contexts: [{text | has_answer}]}}
    (reference nq_eval.py:221-249). Returns {k: accuracy}."""
    tokenizer = SimpleTokenizer()
    with open(retrieval_file) as fh:
        retrieval = json.load(fh)
    max_k = max(topk)
    accuracy = {k: [] for k in topk}

    for qid in retrieval:
        answers = retrieval[qid]["answers"]
        contexts = retrieval[qid]["contexts"]
        has_ans_idx = max_k
        for idx, ctx in enumerate(contexts[:max_k]):
            if "has_answer" in ctx:
                if ctx["has_answer"]:
                    has_ans_idx = idx
                    break
            else:
                # contexts store "title\ntext" (reference :240)
                parts = ctx["text"].split("\n")
                text = parts[1] if len(parts) > 1 else parts[0]
                if has_answers(text, answers, tokenizer, regex):
                    has_ans_idx = idx
                    break
        for k in topk:
            accuracy[k].append(0 if has_ans_idx >= k else 1)

    result = {k: (sum(v) / len(v) if v else 0.0) for k, v in accuracy.items()}
    for k in topk:
        print(f"Top{k}\taccuracy: {result[k]:.4f}")
    return result


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--retrieval", type=str, metavar="path",
                        help="Path to retrieval output file.")
    parser.add_argument("--topk", type=int, nargs="+", help="topk to evaluate")
    parser.add_argument("--regex", action="store_true", default=False, help="regex match")
    args = parser.parse_args()
    evaluate_retrieval(args.retrieval, args.topk, args.regex)


if __name__ == "__main__":
    main()

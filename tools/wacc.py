#!/usr/bin/env python
"""Word accuracy between reference and hypothesis transcript files.

Re-design of reference tools/WAcc.py: WAcc = 1 - WER, computed with a
standard Levenshtein word alignment (self-contained, no jiwer dependency).
Transcript format: one utterance per line, "utt_id words..." or just words.
"""

from __future__ import annotations

import argparse


def wer(ref_words, hyp_words) -> int:
    """Word-level edit distance."""
    n, m = len(ref_words), len(hyp_words)
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        for j in range(1, m + 1):
            sub = prev[j - 1] + (ref_words[i - 1] != hyp_words[j - 1])
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, sub)
        prev = cur
    return prev[m]


def load_transcripts(path, has_ids: bool):
    out = {}
    for i, line in enumerate(open(path)):
        parts = line.strip().split()
        if not parts:
            continue
        if has_ids:
            out[parts[0]] = [w.lower() for w in parts[1:]]
        else:
            out[str(i)] = [w.lower() for w in parts]
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-R", "--reference", required=True)
    p.add_argument("-H", "--hypothesis", required=True)
    p.add_argument("--has_ids", action="store_true", help="lines start with utt ids")
    args = p.parse_args()

    refs = load_transcripts(args.reference, args.has_ids)
    hyps = load_transcripts(args.hypothesis, args.has_ids)

    total_err = total_words = 0
    for utt, ref_words in refs.items():
        hyp_words = hyps.get(utt, [])
        total_err += wer(ref_words, hyp_words)
        total_words += len(ref_words)
    wacc = 1.0 - total_err / max(total_words, 1)
    print(f"utterances: {len(refs)}  words: {total_words}  WER: {1 - wacc:.4f}  WAcc: {wacc:.4f}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Golden generator for the RecursiveCharacterTextSplitter port.

Independent Python implementation of the published LangChain recursive
character splitting algorithm (keep_separator=True, strip_whitespace=True,
literal separators), used only to cross-check the Scala implementation on
randomized inputs. Writes JSON goldens consumed by ChunkerSpec.
"""
import json
import random
import re
import sys


def split_text_with_regex(text, separator, keep_separator=True):
    if separator:
        if keep_separator:
            _splits = re.split(f"({re.escape(separator)})", text)
            splits = [_splits[i] + _splits[i + 1] for i in range(1, len(_splits), 2)]
            if len(_splits) % 2 == 0:
                splits += _splits[-1:]
            splits = [_splits[0]] + splits
        else:
            splits = re.split(re.escape(separator), text)
    else:
        splits = list(text)
    return [s for s in splits if s != ""]


class Splitter:
    def __init__(self, chunk_size=400, chunk_overlap=100,
                 separators=("\n\n", "\n", ". ", " ", "")):
        self.chunk_size = chunk_size
        self.chunk_overlap = chunk_overlap
        self.separators = list(separators)

    def split_text(self, text):
        return self._split_text(text, self.separators)

    def _split_text(self, text, separators):
        final_chunks = []
        separator = separators[-1]
        new_separators = []
        for i, s in enumerate(separators):
            if s == "":
                separator = s
                break
            if s in text:
                separator = s
                new_separators = separators[i + 1:]
                break
        splits = split_text_with_regex(text, separator, keep_separator=True)
        good_splits = []
        merge_sep = ""
        for s in splits:
            if len(s) < self.chunk_size:
                good_splits.append(s)
            else:
                if good_splits:
                    final_chunks.extend(self._merge_splits(good_splits, merge_sep))
                    good_splits = []
                if not new_separators:
                    final_chunks.append(s)
                else:
                    final_chunks.extend(self._split_text(s, new_separators))
        if good_splits:
            final_chunks.extend(self._merge_splits(good_splits, merge_sep))
        return final_chunks

    def _merge_splits(self, splits, separator):
        separator_len = len(separator)
        docs = []
        current_doc = []
        total = 0
        for d in splits:
            _len = len(d)
            if total + _len + (separator_len if current_doc else 0) > self.chunk_size:
                if current_doc:
                    doc = self._join_docs(current_doc, separator)
                    if doc is not None:
                        docs.append(doc)
                    while total > self.chunk_overlap or (
                        total + _len + (separator_len if current_doc else 0) > self.chunk_size
                        and total > 0
                    ):
                        total -= len(current_doc[0]) + (
                            separator_len if len(current_doc) > 1 else 0)
                        current_doc = current_doc[1:]
            current_doc.append(d)
            total += _len + (separator_len if len(current_doc) > 1 else 0)
        doc = self._join_docs(current_doc, separator)
        if doc is not None:
            docs.append(doc)
        return docs

    def _join_docs(self, docs, separator):
        text = separator.join(docs).strip()
        return text if text else None


def random_text(rng):
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "data",
             "spark", "chunk", "vector", "index", "the", "of", "and", "a",
             "pipeline", "document", "engine", "x" * 30, "y" * 120]
    seps = [" ", " ", " ", ". ", "\n", "\n\n", "", "\t"]
    n = rng.randint(0, 400)
    parts = []
    for _ in range(n):
        parts.append(rng.choice(words))
        parts.append(rng.choice(seps))
    return "".join(parts)


def main(out_path):
    rng = random.Random(42)
    cases = []
    fixed = [
        "",
        "   ",
        "short text",
        "a" * 399,
        "a" * 400,
        "a" * 401,
        "b" * 1200,
        ("word " * 200).strip(),
        ("sentence one. " * 60).strip(),
        "para one\n\npara two\n\n" + "long paragraph " * 40 + "\nline\nline two. end",
        "nosep" * 300,
        ". . . . ",
        "\n\n\n\nx\n\n\n\n",
    ]
    for t in fixed:
        cases.append(t)
    for _ in range(200):
        cases.append(random_text(rng))
    configs = [(400, 100), (100, 20), (50, 10), (10, 3)]
    out = []
    for size, overlap in configs:
        sp = Splitter(size, overlap)
        for t in cases:
            out.append({"size": size, "overlap": overlap, "text": t,
                        "chunks": sp.split_text(t)})
    with open(out_path, "w") as f:
        json.dump(out, f)
    print(f"wrote {len(out)} cases to {out_path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/splitter_goldens.json")

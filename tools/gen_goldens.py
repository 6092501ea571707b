"""Generate the pinned golden top-k files under tests/golden/.

Run once (and only rerun on a deliberate, documented semantics change):

    python tools/gen_goldens.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pysearch.corpus import CASES  # noqa: E402
from pysearch.oracle import brute_topk, case_docs  # noqa: E402

K = 10
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for case_id, term, num_docs, doc_len in CASES:
        docs = case_docs(case_id, term, num_docs, doc_len)
        top = brute_topk(docs, term, K)
        path = os.path.join(OUT, f"case_{case_id}_top{K}.json")
        with open(path, "w") as f:
            json.dump(
                {
                    "case_id": case_id,
                    "term": term,
                    "num_docs": num_docs,
                    "doc_len": doc_len,
                    "k": K,
                    "top": [[i, s] for i, s in top],
                },
                f,
                indent=1,
            )
        print(path, "->", top[:3])


if __name__ == "__main__":
    main()

"""S3: stdin/stdout TSV codec shim (SURVEY.md §2.1).

The reference's IndexBuilder/EntityLinker CLIs stream TSV lines
(``backend/.../IndexBuilder.scala:119``,
``linker/.../EntityLinker.scala:196-211``). This shim reads chunked
sentences in the chunker's TSV layout (tokens, postags, chunktags,
url — ``hadoop/.../ScoobiSentenceChunker.scala:35-41``) from stdin and
writes ReVerbExtraction TSV rows (7-col reference format) to stdout,
running the extraction through a real (local-mode) Ray pipeline via
``ray.data.from_items``.  With ``--openie4`` it runs the OpenIE4 path
instead and emits the reference's prefixed dump lines
("T\t<12-col TripleExtraction>" / "N\t<12-col NaryExtraction>",
``ScoobiOpenIE4.scala:140-143``).

    printf 'Mozart was born .\tNNP VBD VBN .\tB-NP B-VP I-VP O\tu\n' \
        | python scripts/tsv_extract.py [--openie4]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 log_to_driver=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from openie_backend_ray.fixtures.reverb_tsv import (
        Extraction,
        write_extraction,
    )
    from openie_backend_ray.stages.extractor import extract_batch

    items = []
    for i, line in enumerate(sys.stdin):
        cols = line.rstrip("\n").split("\t")
        if len(cols) < 3:
            continue
        toks = cols[0].split(" ")
        tags = cols[1].split(" ")
        chks = cols[2].split(" ")
        url = cols[3] if len(cols) > 3 else ""
        items.append(
            {"doc_id": f"stdin{i}", "span_idx": 0, "tokens": toks,
             "postags": tags, "chunks": chks, "source_url": url}
        )
    if not items:
        return 0
    if "--openie4" in sys.argv:
        from openie_backend_ray.fixtures.oie4_tsv import oie4_row_to_line
        from openie_backend_ray.stages.openie4 import OpenIE4Actor

        out = ray.data.from_items(items).map_batches(
            OpenIE4Actor, fn_constructor_kwargs={"corpus": "stdin"},
            batch_format="pyarrow", concurrency=(1, 1),
        )
        for row in out.take_all():
            sys.stdout.write(oie4_row_to_line(row) + "\n")
        ray.shutdown()
        return 0
    ds = ray.data.from_items(items).map_batches(
        extract_batch, batch_format="pyarrow"
    )
    for row in ds.take_all():
        e = Extraction(
            tokens=list(row["tokens"]),
            postags=list(row["postags"]),
            chunks=list(row["chunks"]),
            arg1=(row["arg1"]["start"], row["arg1"]["end"]),
            rel=(row["rel"]["start"], row["rel"]["end"]),
            arg2=(row["arg2"]["start"], row["arg2"]["end"]),
            source_url=row["source_url"],
        )
        sys.stdout.write(write_extraction(e) + "\n")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

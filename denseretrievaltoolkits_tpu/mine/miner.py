"""On-device dense hard-negative mining (ANCE-style refresh).

The reference mines hard negatives OFFLINE with host BM25
(``run_BM25_negative.py:53-55``) — negatives never improve as the model
trains.  On TPU the corpus index is already resident in HBM after every
evaluation epoch, so mining the CURRENT model's hardest negatives is one
batched top-k sweep over the train queries:

  encode train queries → index.search(k + headroom) → drop the query's own
  positives (by docid) → take the next ``n_negatives`` doc token-id lists →
  rewrite each sample's ``negatives``.

The refreshed dataset feeds the same QPCollator/random-sampler path, so the
input pipeline never stalls: mining happens between epochs at the same
cadence flag style as save/eval (``mine_per_train``).

Operating envelope (measured, BASELINE.md round-5 multi-seed): keep the
mined-negative count per query WELL BELOW the mining depth and give the
epoch budget headroom to absorb each refresh dip.  At train_n_passages=2
(1 mined negative) with a converged epoch budget, refresh wins Recall@100
on every seed (+0.07..+0.12 paired); at train_n_passages=8 (7 mined
negatives from depth k~17) 2 of 5 seeds collapse outright — the batch
saturates with near-duplicates and false negatives.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence

import numpy as np

from ..data.collators import create_one_example, pad_batch
from ..data.loaders import pad_to_batch

logger = logging.getLogger(__name__)


class DenseMiner:
    """Mines negatives for tokenized train samples from a device-resident index."""

    def __init__(self, trainer, tokenizer, data_args, headroom: int = 10,
                 search_mode: Optional[str] = None):
        self.trainer = trainer
        self.tokenizer = tokenizer
        self.q_max_len = data_args.q_max_len
        self.n_negatives = data_args.train_n_passages - 1
        self.headroom = headroom
        # mining is a bulk sweep over every train query — it rides the packed
        # serving kernel by default regardless of the eval search_mode
        # (recall@100 ~0.9995 measured; a mined negative at rank k±1 is the
        # same negative for training purposes)
        self.search_mode = "serve" if search_mode is None else search_mode

    def _encode_queries(self, samples: Sequence[dict], batch_size: int = 128) -> np.ndarray:
        pad_id = getattr(self.tokenizer, "pad_token_id", 0) or 0
        reps = []
        for start in range(0, len(samples), batch_size):
            chunk = samples[start : start + batch_size]
            enq = [
                create_one_example(s["query"], self.tokenizer, q_max_len=self.q_max_len)
                for s in chunk
            ]
            batch = pad_batch(enq, self.q_max_len, pad_id)
            padded, valid = pad_to_batch(batch, batch_size)
            # _local_rows: on multi-host the jitted encode returns the
            # assembled global batch (data-axis pinned, not addressable via
            # np.asarray); queries are replicated, so this host's local rows
            # are its own copy (train/trainer.py)
            out = self.trainer._local_rows(
                self.trainer._encode_query(self.trainer.state["params"],
                                           padded))
            reps.append(out[:valid])
        return np.concatenate(reps, axis=0)

    def mine(
        self,
        train_samples: Sequence[dict],
        positive_docids: Optional[Sequence[set]] = None,
    ) -> List[dict]:
        """Return train samples with ``negatives`` replaced by dense-mined ones.

        ``positive_docids``: per-sample sets of docids to exclude; when absent,
        exclusion falls back to exact token-id-list matching against the
        sample's positives.
        """
        trainer = self.trainer
        if trainer.index is None:
            raise RuntimeError("corpus index not built; run trainer.evaluate (or "
                               "_encoding_corpus) before mining")
        corpus_ds = getattr(trainer.corpus_dataloader, "dataset", None)
        if corpus_ds is None:
            raise RuntimeError("miner needs the corpus dataloader's dataset for "
                               "token-id lookup")

        samples = list(train_samples)
        q_reps = self._encode_queries(samples)
        k = min(self.n_negatives + self.headroom, len(trainer.index))
        _, indices = trainer.index.batch_search(q_reps, k, batch_size=256,
                                                quiet=True, mode=self.search_mode)

        mined: List[dict] = []
        refreshed = 0
        for i, sample in enumerate(samples):
            if positive_docids is not None:
                own = positive_docids[i]
                exclude_by_id = True
            else:
                own = {tuple(p) for p in sample["positives"]}
                exclude_by_id = False
            negs = []
            for row in indices[i]:
                if row < 0:
                    # -1 sentinel (fewer finite candidates than k, e.g. tiny
                    # IVF cells) — trainer.idx[-1] would silently mine the
                    # LAST corpus doc as a negative
                    continue
                docid = trainer.idx[int(row)]
                # length-sorted builds: index row -> dataset row via perm
                perm = getattr(trainer, "_row2ds", None)
                ds_row = int(perm[int(row)]) if perm is not None else int(row)
                doc_tokens = corpus_ds[ds_row]["text"]
                if exclude_by_id:
                    if docid in own:
                        continue
                elif tuple(doc_tokens) in own:
                    continue
                negs.append(list(doc_tokens))
                if len(negs) == self.n_negatives:
                    break
            row_out = dict(sample)
            if len(negs) == self.n_negatives:
                row_out["negatives"] = negs
                refreshed += 1
            mined.append(row_out)
        logger.info("dense miner refreshed %d/%d samples (k=%d)", refreshed,
                    len(samples), k)
        return mined

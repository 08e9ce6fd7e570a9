"""Byte-pair-encoding tokenizer as a durable corpus asset.

Training pipelines budget data in TOKENIZER tokens, not whitespace
tokens (counts differ 1.3-2x on web text), so the token-budget
operators (``chunk_documents``, ``pack_sequences``,
``cap_per_group(weight_col=)``) need a real subword tokenizer to count
with. This module provides the classic BPE algorithm (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units" —
public) in the engine's durable-asset shape:

- ``train_bpe`` — ONE distributed pass over the corpus (pre-tokenize
  with ``BPE_TOKEN_RE``, explode, word-count shuffle with map-side
  combine), capped to the top ``max_words`` distinct words by mass.
  The merge loop then runs driver-side over that BOUNDED word-frequency
  dictionary — the standard formulation (subword-nmt trains on a word
  dict, not the raw corpus), and the right 100 TB shape: corpus I/O is
  one scan + one vocabulary-keyed shuffle regardless of ``num_merges``,
  while a "fully distributed" loop would pay one shuffle PER merge
  (thousands of jobs). The result is a merges Table
  ``(rank, left, right)`` — ``parquet_export`` it like
  ``term_stats_table`` and re-import forever.
- ``apply_bpe`` — broadcast the (small) ranks table, Arrow-batched
  encode with a per-batch word cache (web text repeats words heavily;
  each distinct word is merged once per batch). Emits the token count
  (and optionally the pieces and/or token ids) per document.
- ``train_bpe(byte_level=True)`` — GPT-2-style BYTE-level BPE: words
  map through the reversible byte→printable-char table before merging
  (Sennrich merges over bytes, Radford et al. 2019 formulation —
  public), the asset seeds the full 256-byte alphabet, and NO text can
  ever produce an unk. The mapping runs driver-side on the bounded
  word dict and inside the existing Arrow closures — the distributed
  plan is identical to char-level.
- ``bpe_vocab`` / ``apply_bpe(emit_ids=True)`` / ``detokenize_bpe`` /
  ``pack_token_ids`` — the TOKEN-ID surface models actually consume:
  a stable piece→id vocabulary derived purely from the merges asset
  (unk + sorted base alphabet + one piece per merge rank, so every
  holder of the asset agrees on every id), id-array emission, the
  inverse text reconstruction, and per-(shard, pack) id concatenation
  for training-ready packed sequences.

Not SQL-expressible (iterative merges), so there is no DuckDB oracle —
correctness is pinned by unit tests against hand-computed merges and a
differential test between the distributed count path and a local
reference implementation (see tests/test_bpe.py); documented in
COVERAGE.md like the hashed text classifier.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import functions as F

from ..session import small_df
from ..table import Table
from .textops import BPE_TOKEN_RE

END = "</w>"

_BYTE_LEVEL_FLAG = "byte_level"


def _bytes_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte→printable-unicode map (public algorithm):
    the 188 visible latin-1 bytes map to themselves; the other 68
    (controls, space, DEL, soft hyphen...) map to 256+i so every byte
    is a single printable char and merged pieces remain readable
    strings. Byte-level BPE operates on these chars, so ANY utf-8 text
    — emoji, CJK, mojibake, binary junk — tokenizes with zero unks."""
    visible = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(0xA1, 0xAD))
        + list(range(0xAE, 0x100))
    )
    mapping = {b: chr(b) for b in visible}
    n = 0
    for b in range(256):
        if b not in mapping:
            mapping[b] = chr(256 + n)
            n += 1
    return mapping


_B2U = _bytes_to_unicode()
_U2B = {c: b for b, c in _B2U.items()}


def _to_byte_space(word: str) -> str:
    return "".join(_B2U[b] for b in word.encode("utf-8"))


# ------------------------------------------------------------------ #
# driver-side merge loop (bounded by max_words, not corpus size)


def _word_symbols(word: str) -> tuple[str, ...]:
    """A word as its initial symbol sequence: chars, with the end-of-
    word marker fused onto the last char (subword-nmt convention) so
    merges can't cross word boundaries and word-final units stay
    distinct from word-internal ones."""
    if not word:
        return ()
    chars = list(word)
    chars[-1] += END
    return tuple(chars)


def _train_merges(
    word_counts: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE over a word-frequency dict with incremental pair
    statistics (the subword-nmt algorithm): O(merges × affected words)
    instead of re-counting every pair every round. Deterministic:
    best pair = (max count, then lexicographically smallest pair)."""
    words: list[list[str]] = []
    counts: list[int] = []
    for w, c in word_counts:
        syms = _word_symbols(w)
        if len(syms) >= 2:
            words.append(list(syms))
            counts.append(c)

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for idx, syms in enumerate(words):
        c = counts[idx]
        for pair in zip(syms, syms[1:]):
            pair_counts[pair] = pair_counts.get(pair, 0) + c
            pair_words.setdefault(pair, set()).add(idx)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = None
        best_count = 0
        for pair, c in pair_counts.items():
            if c > best_count or (c == best_count and best is not None and pair < best):
                best, best_count = pair, c
        if best is None or best_count < 1:
            break
        merges.append(best)
        new_sym = best[0] + best[1]
        for idx in list(pair_words.get(best, ())):
            syms = words[idx]
            c = counts[idx]
            # remove this word's contribution to all its pairs
            for pair in zip(syms, syms[1:]):
                pair_counts[pair] -= c
                if pair_counts[pair] <= 0:
                    pair_counts.pop(pair, None)
                ws = pair_words.get(pair)
                if ws is not None:
                    ws.discard(idx)
                    if not ws:
                        pair_words.pop(pair, None)
            # apply the merge within the word
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[idx] = out
            # add back the new pair contributions
            for pair in zip(out, out[1:]):
                pair_counts[pair] = pair_counts.get(pair, 0) + c
                pair_words.setdefault(pair, set()).add(idx)
    return merges


def _encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> tuple[str, ...]:
    """GPT-2-style greedy encode: repeatedly merge the lowest-rank
    adjacent pair until none of the word's pairs has a rank."""
    syms = list(_word_symbols(word))
    while len(syms) >= 2:
        best_i = -1
        best_rank = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return tuple(syms)


# ------------------------------------------------------------------ #
# public API


def train_bpe(
    table: Table,
    text_col: str,
    num_merges: int = 1000,
    max_words: int = 200_000,
    min_count: int = 1,
    byte_level: bool = False,
) -> Table:
    """Train BPE merges over the corpus; returns the merges Table
    ``(rank int, left string, right string)`` — the durable asset.

    Scale shape: pre-tokenize + explode + word-count is ONE shuffle
    with map-side combine whose output is vocabulary-bounded;
    ``max_words`` (ordered by count desc, word asc — deterministic)
    bounds what reaches the driver, and on web text the top 200k words
    carry ~99% of token mass, so the truncation moves merge statistics
    negligibly while keeping the driver memory O(max_words).

    ``byte_level=True`` trains GPT-2-style BYTE-level BPE: each word's
    utf-8 bytes map through the reversible printable-char table before
    merging (driver-side, on the bounded word dict — the distributed
    plan is unchanged), the asset's alphabet seeds ALL 256 byte chars
    in both plain and word-final forms, and a ``byte_level`` marker row
    makes ``apply_bpe``/``bpe_vocab``/``detokenize_bpe`` self-configure
    from the asset. Consequence: NO text can ever produce an unk — the
    closed-vocabulary caveat of char-level assets disappears.
    """
    df = table._require_df()
    words = (
        df.select(
            F.explode(
                F.regexp_extract_all(
                    F.col(text_col), F.lit(BPE_TOKEN_RE), F.lit(0)
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= F.lit(int(min_count)))
        .orderBy(F.col("cnt").desc(), F.col("word").asc())
        .limit(int(max_words))
    )
    pairs = [(r["word"], int(r["cnt"])) for r in words.collect()]
    if byte_level:
        pairs = [(_to_byte_space(w), c) for w, c in pairs]
    merges = _train_merges(pairs, num_merges)
    # the asset also carries the training ALPHABET (rank/right NULL):
    # single-symbol words ('\n', 'a', whitespace runs) never join a
    # merge, so a merges-only vocabulary would map them — some of the
    # most frequent tokens in any corpus — to unk. Readers that only
    # want ranks filter right IS NOT NULL (old assets lack these rows
    # and degrade to the merges-derived alphabet). Byte-level seeds the
    # FULL byte alphabet (plain + word-final forms) so coverage is
    # total, not corpus-dependent.
    if byte_level:
        alphabet = sorted(
            {c for c in _B2U.values()} | {c + END for c in _B2U.values()}
        )
    else:
        alphabet = sorted({s for w, _ in pairs for s in _word_symbols(w)})
    spark = table.spark
    rows = [(i, left, right) for i, (left, right) in enumerate(merges)]
    rows += [(None, sym, None) for sym in alphabet]
    if byte_level:
        # marker row (rank NULL, left NULL): readers self-configure
        rows.append((None, None, _BYTE_LEVEL_FLAG))
    out = small_df(spark, rows, "rank int, left string, right string")
    return Table.from_df(out, name=f"{table.table_name}_bpe_merges")


def _load_asset(
    merges: Table,
) -> tuple[list[tuple[int, str, str]], list[str], bool]:
    """(merge rows sorted by rank, alphabet symbols, byte_level flag)
    from a train_bpe asset. Alphabet rows have NULL rank/right; the
    byte-level marker row has NULL rank/left; assets written before
    round 9 have neither, and the vocab then degrades to the
    merges-derived alphabet."""
    for c in ("rank", "left", "right"):
        if c not in merges.fields:
            raise ValueError(
                f"need a train_bpe merges table (missing {c!r}); "
                f"got {merges.fields}"
            )
    merge_rows: list[tuple[int, str, str]] = []
    alphabet: list[str] = []
    byte_level = False
    for r in merges._require_df().collect():
        if r["left"] is None:
            byte_level = byte_level or r["right"] == _BYTE_LEVEL_FLAG
        elif r["right"] is None:
            alphabet.append(r["left"])
        else:
            merge_rows.append((int(r["rank"]), r["left"], r["right"]))
    merge_rows.sort()
    return merge_rows, alphabet, byte_level


def _load_merge_rows(merges: Table) -> list[tuple[int, str, str]]:
    return _load_asset(merges)[0]


def _load_ranks(merges: Table) -> dict[tuple[str, str], int]:
    return {(l, r): rank for rank, l, r in _load_merge_rows(merges)}


UNK_ID = 0


def _vocab_list(
    merge_rows: list[tuple[int, str, str]],
    alphabet: list[str] = (),
    unk_piece: str = "<unk>",
) -> list[str]:
    """Stable vocabulary derived PURELY from the merges asset (so any
    two holders of the same merges table agree on every id): index 0
    is the unk piece, then the base alphabet — the asset's alphabet
    rows plus any symbol a merge consumes, minus merge products,
    sorted — then one piece per merge in rank order (first rank wins
    on the rare duplicate product, e.g. ('a','bc') and ('ab','c')
    both producing 'abc').

    Every piece ``_encode_word`` can emit is either a merge product or
    a single base symbol; symbols outside the asset's alphabet
    (characters the training corpus never saw) map to ``UNK_ID`` —
    the standard closed-vocabulary contract (count unks downstream
    for the audit trail)."""
    ordered = sorted(merge_rows)
    produced = {left + right for _, left, right in ordered}
    consumed = {s for _, left, right in ordered for s in (left, right)}
    base = sorted((set(alphabet) | consumed) - produced)
    seen = set(base)
    if unk_piece in seen or unk_piece in produced:
        raise ValueError(
            f"unk_piece {unk_piece!r} collides with a real vocab piece; "
            "pass a different unk_piece"
        )
    vocab = [unk_piece] + base
    for _, left, right in ordered:
        p = left + right
        if p not in seen:
            seen.add(p)
            vocab.append(p)
    return vocab


def bpe_vocab(merges: Table, unk_piece: str = "<unk>") -> Table:
    """Materialize the stable vocab table ``(token_id int, piece
    string)`` for a merges asset — the id↔piece mapping that
    ``apply_bpe(emit_ids=True)`` and ``detokenize_bpe`` both derive
    internally, exposed as its own durable asset for model configs and
    external consumers. Deterministic: same merges table → same ids,
    forever (alphabet + rank order; see ``_vocab_list``)."""
    merge_rows, alphabet, _byte = _load_asset(merges)
    vocab = _vocab_list(merge_rows, alphabet, unk_piece)
    out = small_df(
        merges.spark, list(enumerate(vocab)), "token_id int, piece string"
    )
    return Table.from_df(out, name=f"{merges.table_name}_vocab")


def apply_bpe(
    table: Table,
    text_col: str,
    id_col: str,
    merges: Table,
    emit_pieces: bool = False,
    emit_ids: bool = False,
    unk_piece: str = "<unk>",
) -> Table:
    """Tokenize every document with a trained merges table; emits
    ``(id, n_bpe_tokens)`` (+ ``pieces array<string>`` when
    ``emit_pieces``, + ``token_ids array<int>`` when ``emit_ids``) for
    the token-budget operators to consume — e.g. join the counts back
    and ``pack_sequences(..., weight_col="n_bpe_tokens")``, or feed
    ``token_ids`` through ``pack_token_ids`` for training-ready packed
    sequences.

    ``token_ids`` use the stable vocabulary derived from the merges
    asset itself (``bpe_vocab`` — alphabet + rank order), so ids are
    identical across sessions and holders of the same asset; pieces
    outside the vocab (characters the training corpus never merged)
    map to ``UNK_ID`` (0).

    Scale shape: the ranks dict is merges-table-sized (small) and
    BROADCAST once per executor, not shipped per task; encoding runs
    inside Arrow batches with a per-batch distinct-word cache, so each
    repeated word (web text is extremely repetitive) is merged once
    per batch. No shuffle — a pure mapInPandas over the corpus scan.
    """
    merge_rows, alphabet, byte_level = _load_asset(merges)
    ranks = {(left, right): rank for rank, left, right in merge_rows}
    piece_ids = (
        {
            p: i
            for i, p in enumerate(
                _vocab_list(merge_rows, alphabet, unk_piece)
            )
        }
        if emit_ids
        else None
    )
    bc = table.spark.sparkContext.broadcast((ranks, piece_ids, byte_level))
    pattern = BPE_TOKEN_RE

    id_type = dict(table._require_df().dtypes)[id_col]  # not only long ids
    schema = f"{id_col} {id_type}, n_bpe_tokens int"
    if emit_pieces:
        schema += ", pieces array<string>"
    if emit_ids:
        schema += ", token_ids array<int>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re as _re

        rx = _re.compile(pattern)
        rk, pids, bl = bc.value

        if not emit_pieces and pids is None:
            # count-only fast path (the token-budget callers): cache each
            # distinct word's token COUNT instead of its piece tuple and
            # never materialize the per-doc piece list — same arithmetic
            # (len of the same _encode_word result), ~30% less Python per
            # batch (guide §4.2: make the in-worker loop do only the work
            # the output needs)
            lcache: dict[str, int] = {}

            def enc_len(word: str) -> int:
                got = lcache.get(word)
                if got is None:
                    got = len(
                        _encode_word(
                            _to_byte_space(word) if bl else word, rk
                        )
                    )
                    lcache[word] = got
                return got

            for pdf in batches:
                if pdf.empty:
                    continue
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        "n_bpe_tokens": [
                            sum(map(enc_len, rx.findall(text or "")))
                            for text in pdf[text_col]
                        ],
                    }
                )
            return

        cache: dict[str, tuple[str, ...]] = {}

        def enc(word: str) -> tuple[str, ...]:
            got = cache.get(word)
            if got is None:
                got = _encode_word(
                    _to_byte_space(word) if bl else word, rk
                )
                cache[word] = got
            return got

        for pdf in batches:
            if pdf.empty:
                continue
            counts: list[int] = []
            pieces: list[list[str]] = []
            ids: list[list[int]] = []
            for text in pdf[text_col]:
                toks: list[str] = []
                for w in rx.findall(text or ""):
                    toks.extend(enc(w))
                counts.append(len(toks))
                if emit_pieces:
                    pieces.append(toks)
                if pids is not None:
                    ids.append([pids.get(t, UNK_ID) for t in toks])
            data = {id_col: pdf[id_col], "n_bpe_tokens": counts}
            if emit_pieces:
                data["pieces"] = pieces
            if pids is not None:
                data["token_ids"] = ids
            yield pd.DataFrame(data)

    out = table._require_df().select(id_col, text_col).mapInPandas(run, schema)
    return Table.from_df(out, name=f"{table.table_name}_bpe")


def detokenize_bpe(
    table: Table,
    ids_col: str,
    id_col: str,
    merges: Table,
    unk_piece: str = "<unk>",
) -> Table:
    """Map token-id arrays back to text: ``(id, text string)``. The
    inverse of ``apply_bpe(emit_ids=True)`` — lossless for any
    fully-in-vocab encoding (``</w>`` markers drop; separators live in
    the pieces, including whitespace-run tokens), while unk ids decode
    to the literal ``unk_piece`` string (the information was lost at
    encode time). Ids outside the vocab range also decode as unk
    rather than failing the job.

    For a byte-level asset the pieces live in byte-char space; the
    decoder maps them back through the reversible table and utf-8
    decodes (``errors="replace"`` — only reachable if out-of-range ids
    split a multi-byte character).

    Scale shape: the id→piece list is broadcast once per executor and
    decode is a pure mapInPandas over the scan — no shuffle, no joins.
    """
    merge_rows, alphabet, byte_level = _load_asset(merges)
    vocab = _vocab_list(merge_rows, alphabet, unk_piece)
    bc = table.spark.sparkContext.broadcast((vocab, byte_level))
    id_type = dict(table._require_df().dtypes)[id_col]
    schema = f"{id_col} {id_type}, text string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        voc, bl = bc.value
        n = len(voc)
        unk = voc[UNK_ID]
        end_len = len(END)
        for pdf in batches:
            if pdf.empty:
                continue
            texts = []
            for ids in pdf[ids_col]:
                # strip END only as a piece SUFFIX (it is piece-final
                # by construction); literal "</w>" in source text sits
                # mid-piece and must round-trip
                joined = "".join(
                    p[:-end_len] if p.endswith(END) else p
                    for p in (
                        voc[i] if 0 <= i < n else unk
                        for i in (ids if ids is not None else ())
                    )
                )
                if bl:
                    joined = bytes(
                        _U2B.get(c, ord("?")) for c in joined
                    ).decode("utf-8", errors="replace")
                texts.append(joined)
            yield pd.DataFrame({id_col: pdf[id_col], "text": texts})

    out = table._require_df().select(id_col, ids_col).mapInPandas(run, schema)
    return Table.from_df(out, name=f"{table.table_name}_detok")


def pack_token_ids(
    table: Table,
    id_col: str,
    ids_col: str = "token_ids",
) -> Table:
    """Concatenate per-document token-id arrays into ONE id array per
    (shard, pack) — the final training-ready step: join
    ``pack_sequences`` output with ``apply_bpe(emit_ids=True)`` and
    this emits ``(shard, pack, token_ids, n_docs, n_tokens)``, where
    ``token_ids`` is every member document's ids concatenated in id
    order (the same order ``pack_offset`` was assigned in).

    Fully native: one groupBy shuffle on (shard, pack) whose payload
    is already tokenized ids (no text), then an in-group
    ``array_sort(struct)`` + ``flatten`` — no UDF, no driver
    materialization; each pack is budget-bounded so the per-group
    array is small by construction.
    """
    df = table._require_df()
    missing = [c for c in ("shard", "pack", id_col, ids_col) if c not in df.columns]
    if missing:
        raise ValueError(
            f"pack_token_ids needs pack_sequences coordinates joined with "
            f"the id arrays (missing {missing}); got {df.columns}"
        )
    pair = F.struct(F.col(id_col).alias("k"), F.col(ids_col).alias("v"))
    out = (
        df.groupBy("shard", "pack")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(pair)), lambda s: s["v"]
                )
            ).alias(ids_col),
            F.count(F.lit(1)).cast("int").alias("n_docs"),
        )
        .withColumn("n_tokens", F.size(F.col(ids_col)))
    )
    return Table.from_df(out, name=f"{table.table_name}_packed_ids")


def chunk_by_pieces(
    table: Table,
    pieces_col: str,
    id_col: str,
    chunk_tokens: int = 128,
    overlap: int = 0,
) -> Table:
    """Split documents into fixed-size windows of REAL tokenizer tokens
    — ``chunk_documents`` over an ``apply_bpe(emit_pieces=True)``
    column instead of whitespace tokens, so every chunk fits the model
    context it is budgeted for (whitespace chunks can be 1.3-2x over
    in BPE terms on web text).

    Chunk text is reconstructed from the pieces natively: the ``</w>``
    end-of-word markers are DROPPED, and concatenation restores the
    text because separators live in the pieces themselves (the
    pre-tokenizer keeps single spaces fused to the following word and
    emits other whitespace runs — newlines, tabs, multi-spaces — as
    their own tokens). Interior whitespace is therefore exact; each
    chunk is then trimmed at its EDGES only (a window starting at
    ``' word'`` yields ``'word'``), so reconstruction is lossless
    modulo leading/trailing whitespace of the chunk itself. NOTE:
    pieces from a BYTE-level asset live in byte-char space — chunk
    their ``token_ids`` and ``detokenize_bpe`` instead if you need
    readable chunk text. Same
    pure-narrow plan shape as ``chunk_documents``: ``sequence`` of
    window starts, ``posexplode``, ``slice`` — no UDF, no shuffle, and
    the same start rule (no window begins inside the previous chunk's
    overlap region).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    df = table._require_df().select(
        F.col(id_col), F.col(pieces_col).alias("__pc__")
    ).where(F.size("__pc__") > 0)
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size("__pc__") - F.lit(overlap), F.lit(1)),
        F.lit(step),
    )
    # word boundaries live in the pieces' LEADING spaces (the GPT-2
    # pre-tokenizer keeps " word" together), so the </w> marker is
    # dropped, not spaced; trim handles a window starting mid-document
    window = F.slice("__pc__", F.col("__start__"), chunk_tokens)
    # strip END only as a SUFFIX (anchored regex): pieces carry the
    # marker piece-finally by construction, while literal "</w>" in
    # the source text sits mid-piece and must survive reconstruction
    text = F.trim(
        F.array_join(
            F.transform(
                window, lambda p: F.regexp_replace(p, END + "$", "")
            ),
            "",
        )
    )
    out = df.select(
        F.col(id_col),
        F.posexplode(starts).alias("chunk_id", "__start__"),
        F.col("__pc__"),
    ).select(
        F.col(id_col),
        F.col("chunk_id"),
        text.alias("chunk_text"),
        F.size(window).alias("n_chunk_tokens"),
    )
    return Table.from_df(out, name=f"{table.table_name}_bpe_chunks")

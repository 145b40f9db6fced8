"""Text-analysis column expressions — built-in functions only.

Everything here stays inside whole-stage codegen (no Python UDFs): token
arrays via ``split``, set ops via ``array_distinct``/``array_intersect``,
hashing via ``md5``, folds via ``aggregate``/``transform`` higher-order
functions. At 100 TB these run fully vectorized on executors with nothing
crossing the Python boundary.

Hash-family note: near-dup operators need k independent hash functions that
an external oracle (DuckDB) can reproduce exactly. We use salted md5 hex
strings and exploit that lexicographic MIN over uniformly-distributed hex
strings is a valid min-hash — no 64-bit integer conversion needed, and both
engines order lowercase hex identically (plain byte order).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny stopword list shared with the oracle SQL (and present in fixture vocab)
STOPWORDS = ("the", "a")


def tokens(text: Column) -> Column:
    """Whitespace tokens (single-space split — matches oracle string_split)."""
    return F.split(text, " ")


def distinct_tokens(text: Column) -> Column:
    return F.array_distinct(tokens(text))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Deterministic BPE-style token estimate: ceil(chars/4) (the classic
    ~4-chars-per-token heuristic), exact and reproducible in ANSI SQL."""
    return F.ceil(F.length(text) / F.lit(4.0)).cast("long")


def stopword_count(toks: Column) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))


def char_sum(toks: Column) -> Column:
    """Total characters across tokens (integer-exact fold)."""
    return F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))


def content_md5(text: Column) -> Column:
    """Exact-dup fingerprint: md5 of the raw text."""
    return F.md5(text)


def bag_fingerprint(text: Column) -> Column:
    """Order-insensitive fingerprint: md5 over the sorted distinct token set.

    Catches word-reordered exact dups that content_md5 misses.
    """
    return F.md5(F.array_join(F.array_sort(distinct_tokens(text)), " "))


def minhash_signature(toks: Column, num_hashes: int) -> list[Column]:
    """k min-hash values as columns: min over tokens of md5(salt || token).

    Lexicographic min of salted md5 hex == min-hash under a random
    permutation per salt (md5 is uniform on hex strings).
    """
    def one(i: int) -> Column:
        # NB: the lambda must take exactly one parameter — F.transform treats a
        # two-arg lambda as (element, index), which would shadow the salt.
        salt = F.lit(f"{i}:")
        return F.array_min(F.transform(toks, lambda t: F.md5(F.concat(salt, t)))).alias(f"mh{i}")

    return [one(i) for i in range(num_hashes)]


def _hex_digit_parity(c: Column) -> Column:
    """Parity (0/1) of one lowercase hex digit. Oracle-reproducible:
    Spark ``conv(c,16,10)%2`` ≡ DuckDB ``(strpos('0123456789abcdef',c)-1)%2``."""
    return F.conv(c, 16, 10).cast("int") % 2


def token_md5s(toks: Column) -> Column:
    """md5 hex string per token — materialize this as its OWN column before
    feeding ``simhash16_from_hashes``: a fold over an expression re-evaluates
    the whole child array per fold, a fold over an attribute reads the
    computed row value."""
    return F.transform(toks, lambda t: F.md5(t))


def simhash16(toks: Column) -> Column:
    """16-bit SimHash over a token set (convenience single-expression form;
    prefer ``token_md5s`` + ``simhash16_from_hashes`` in hot paths)."""
    return simhash16_from_hashes(token_md5s(toks))


def simhash16_from_hashes(hashes: Column) -> Column:
    """16-bit SimHash over precomputed per-token md5 hex strings.

    Bit b of the output is set iff the signed vote sum over tokens of
    (parity of hex digit b of md5(token)) * 2 - 1 is positive. Pure integer
    arithmetic → bit-identical in any engine.
    """

    def vote(b: int) -> Column:
        # single-(acc, element)-param lambda; close over the bit position
        pos = b + 1
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + _hex_digit_parity(F.substring(h, pos, 1)) * 2 - 1,
        )

    total = F.lit(0)
    for b in range(16):
        total = total + F.when(vote(b) > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return total

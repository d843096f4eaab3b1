"""Tokenizer for MQL.

Token shapes follow the reference terminals
(/root/reference/metacat/mql/grammar/common.py:60-78):

- WORD-like names may contain letters, digits, ``_ - . /`` and ``$ @``
  (covers FNAME, META_NAME, UNQUOTED_STRING and PATTERN; the parser
  decides which production applies from context).
- STRING: single- or double-quoted with backslash escapes.
- Numbers: optionally signed ints / floats.
- Operators: ``< <= > >= = == != ~ ~* !~ !~*`` plus punctuation
  ``( ) [ ] { } , : - !``.

``#`` starts a comment to end of line (reference strips these before
parsing, mql10.py:1361-1366).
"""

from __future__ import annotations

from dataclasses import dataclass


class MQLSyntaxError(Exception):
    pass


@dataclass
class Token:
    kind: str   # 'word', 'string', 'int', 'float', 'op', 'punct', 'pattern'
    value: str
    pos: int

    def __repr__(self):  # pragma: no cover
        return f"{self.kind}:{self.value!r}"


_PUNCT = set("()[]{},:")
# multi-char operators first (longest match)
_OPS = ["<=", ">=", "==", "!=", "!~*", "!~", "~*", "~", "<", ">", "="]

_WORD_CHARS = set("abcdefghijklmnopqrstuvwxyz"
                  "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
                  "0123456789_.$@/-")
# pattern chars for 'matching' contexts additionally allow * ? % ^
_PATTERN_EXTRA = set("*?%^")


def tokenize(text: str) -> list[Token]:
    toks: list[Token] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c in " \t\r\n":
            i += 1
            continue
        if c == "#":  # comment to EOL
            j = text.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if c in "'\"":
            quote = c
            j = i + 1
            buf = []
            while j < n:
                ch = text[j]
                if ch == "\\" and j + 1 < n:
                    # preserve regex escapes: the reference strips ONLY
                    # the enclosing quotes (mql10.py unpack_string), so
                    # "\d+" must stay \d+ — unescaping every \X
                    # corrupted \d to d and \. to the any-char dot
                    # (review r6). Only the quote char itself and \\
                    # unescape, so quotes remain embeddable.
                    nxt = text[j + 1]
                    if nxt == quote or nxt == "\\":
                        buf.append(nxt)
                    else:
                        buf.append(ch)
                        buf.append(nxt)
                    j += 2
                    continue
                if ch == quote:
                    break
                buf.append(ch)
                j += 1
            if j >= n:
                raise MQLSyntaxError(f"unterminated string at {i}")
            toks.append(Token("string", "".join(buf), i))
            i = j + 1
            continue
        if c in _PUNCT:
            toks.append(Token("punct", c, i))
            i += 1
            continue
        # numbers (optionally signed; '-' only starts a number if followed
        # by a digit AND the previous token can't end an expression —
        # otherwise it's the minus operator or part of a word)
        # '-' starts a signed number only where a constant can appear:
        # after an operator/open-punct/comma/colon, or after a keyword
        # that precedes constants — NOT after an operand (word/number/
        # string/closing bracket), where it is the minus operator
        _const_kw = ("in", "where", "and", "or", "not", "skip",
                     "limit", "having")
        if c.isdigit() or (c in "+-" and i + 1 < n and text[i + 1].isdigit()
                           and not (toks and toks[-1].kind in ("int",
                                                               "float",
                                                               "string",
                                                               "pattern")
                                    and c == "-")
                           and not (toks and toks[-1].kind == "word"
                                    and toks[-1].value not in _const_kw
                                    and c == "-")
                           and not (toks and toks[-1].kind == "punct"
                                    and toks[-1].value in ")]}" and c == "-")):
            j = i + 1 if c in "+-" else i
            k = j
            seen_dot = seen_exp = False
            while k < n:
                ch = text[k]
                if ch.isdigit():
                    k += 1
                elif ch == "." and not seen_dot and not seen_exp:
                    seen_dot = True
                    k += 1
                elif ch in "eE" and not seen_exp and k + 1 < n and (
                        text[k + 1].isdigit()
                        or (text[k + 1] in "+-" and k + 2 < n
                            and text[k + 2].isdigit())):
                    # a sign must be FOLLOWED by a digit — '1e+' is
                    # not a float literal (the dangling form lexed as
                    # float and blew up the parser with a raw
                    # ValueError — review r6)
                    seen_exp = True
                    k += 2 if text[k + 1] in "+-" else 1
                else:
                    break
            body = text[i:k]
            # a number immediately followed by word chars is a word
            # (e.g. file ids like 1a2b, names like 2011-11-04 handled below)
            if k < n and (text[k] in _WORD_CHARS or text[k] in _PATTERN_EXTRA):
                pass  # fall through to word lexing
            else:
                # '2011-11-04' style: digits '-' digits → treat the whole
                # run as a word only if '-' directly follows digits and
                # more word chars follow; handled by fall-through too.
                kind = "float" if (seen_dot or seen_exp) else "int"
                toks.append(Token(kind, body, i))
                i = k
                continue
        # operators
        matched = None
        for op in _OPS:
            if text.startswith(op, i):
                matched = op
                break
        if matched:   # '-' is not in _OPS; it is handled below
            # careful: '!' alone is negation punct; '!=' '!~' handled above
            toks.append(Token("op", matched, i))
            i += len(matched)
            continue
        if c == "!":
            toks.append(Token("punct", "!", i))
            i += 1
            continue
        if c == "-":
            toks.append(Token("op", "-", i))
            i += 1
            continue
        if c in _WORD_CHARS or c in _PATTERN_EXTRA:
            j = i
            has_pattern = False
            while j < n and (text[j] in _WORD_CHARS or text[j] in _PATTERN_EXTRA):
                if text[j] in _PATTERN_EXTRA:
                    has_pattern = True
                j += 1
            word = text[i:j]
            toks.append(Token("pattern" if has_pattern else "word", word, i))
            i = j
            continue
        raise MQLSyntaxError(f"unexpected character {c!r} at {i}")
    return toks

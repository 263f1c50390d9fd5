"""Loader-inventory oracle: the converter's tensor inventories must match
the reference loaders' own declarations, parsed out of the reference
SOURCE at test time.

The reference declares every checkpoint tensor with
``ggml_new_tensor_{1,2,3}d(ctx, GGML_TYPE_F32, ne...)`` and binds it to
its file name via ``model.tensors["..."] = member`` inside
`autoregressive_model_load` (main.cpp:482-897), `diffusion_model_load`
(main.cpp:931-1634) and `vocoder_model_load` (main.cpp:1665-2021). This
test expands the loaders' constant-bound loops, evaluates the
std::to_string name arithmetic, and rebuilds the exact {name: ne} map —
so any tensor this repo renames, re-shapes, or drops relative to the
reference fails here, without needing the (non-redistributable) weight
files. Shapes compare as numpy shapes = reversed ggml ne (the io/ggml.py
reading convention), modulo leading length-1 axes (ggml drops trailing
ne of 1: e.g. conv_post.1.weight is declared 2d (7, 32) for a
(1, 32, 7) conv kernel).

Same at-test-time source-parsing trick as parity.py::golden_token_table.
"""

import os
import re

import pytest

from tortoise_tpu.io.checkpoint import (
    ar_params_from_tensors,
    ar_tensor_inventory,
    diffusion_params_from_tensors,
    diffusion_tensor_inventory,
    random_ggml_tensors,
    vocoder_params_from_tensors,
    vocoder_tensor_inventory,
)

REFERENCE = os.environ.get("TORTOISE_REFERENCE", "/root/reference")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REFERENCE, "main.cpp")),
    reason="reference source not available",
)


# --------------------------------------------------------------------------
# reference-source mini parser
# --------------------------------------------------------------------------

_FOR_RE = re.compile(
    r"for\s*\(\s*int\s+(\w+)\s*=\s*(\d+)\s*;\s*\1\s*<\s*(\d+)\s*;"
    r"\s*\1\+\+\s*\)\s*\{")
_TO_STRING_RE = re.compile(r"std::to_string\(([\d\s+\-*/()]+)\)")
_IDX_RE = re.compile(r"\[([\d\s+\-*/]+)\]")
_IF_RE = re.compile(r"if\s*\(([\d\s<>=!+\-*/]+)\)\s*\{")
_DECL_RE = re.compile(
    # the LHS member path may be line-wrapped; the char class excludes
    # ';' and parens so a match can't swallow the previous statement
    r"([\w.\[\]\s]+?)=\s*ggml_new_tensor_([123])d\s*\(\s*ctx\s*,\s*"
    r"GGML_TYPE_F32\s*,([^)]*)\)")
_TENSORS_RE = re.compile(
    # clang-format sometimes splits "model" / ".tensors" across lines
    r"model\s*\.\s*tensors\s*\[([^\]]*)\]\s*=\s*([\w.\[\]\s]+?);")
_ALIAS_RE = re.compile(r"auto\s*&\s*(\w+)\s*=\s*([\w.\[\]]+)\s*;")


def _arith(expr: str) -> int:
    if not re.fullmatch(r"[\d\s+\-*/()]+", expr):
        raise ValueError(f"non-constant arithmetic: {expr!r}")
    return int(eval(expr))  # digits and + - * / ( ) only


def _match_brace(text: str, open_idx: int) -> int:
    depth = 0
    for j in range(open_idx, len(text)):
        if text[j] == "{":
            depth += 1
        elif text[j] == "}":
            depth -= 1
            if depth == 0:
                return j
    raise ValueError("unbalanced braces")


def _strip_comments(src: str) -> str:
    src = re.sub(r"//[^\n]*", "", src)
    return re.sub(r"/\*.*?\*/", "", src, flags=re.S)


def _function_body(src: str, name: str) -> str:
    start = src.index(f"bool {name}(")
    open_idx = src.index("{", start)
    return src[open_idx + 1 : _match_brace(src, open_idx)]


def _expand_loops(text: str) -> str:
    """Unroll constant-bound `for (int v = a; v < b; v++) {}` loops
    (recursively, so the vocoder's nested res_stack/conv_block loops
    expand fully); loops with runtime bounds are left alone — they
    contain no tensor declarations."""
    m = _FOR_RE.search(text)
    if not m:
        return text
    var, lo, hi = m.group(1), int(m.group(2)), int(m.group(3))
    close = _match_brace(text, text.index("{", m.start()))
    body = _expand_loops(text[m.end() : close])
    pieces = [re.sub(rf"\b{var}\b", str(val), body)
              for val in range(lo, hi)]
    return text[: m.start()] + "".join(pieces) + _expand_loops(
        text[close + 1 :])


def _fold_constants(text: str) -> str:
    """Evaluate std::to_string(arith) -> string literal, [arith] -> [int],
    and constant if/else branches (the vocoder picks convt_pre stride by
    `if (i < 2)`)."""
    text = _TO_STRING_RE.sub(lambda m: f'"{_arith(m.group(1))}"', text)
    text = _IDX_RE.sub(lambda m: f"[{_arith(m.group(1))}]", text)
    while True:
        m = _IF_RE.search(text)
        if not m:
            return text
        then_close = _match_brace(text, text.index("{", m.start()))
        then_body = text[m.end() : then_close]
        rest = text[then_close + 1 :]
        else_m = re.match(r"\s*else\s*\{", rest)
        else_body, skip = "", 0
        if else_m:
            else_close = _match_brace(rest, rest.index("{"))
            else_body = rest[else_m.end() : else_close]
            skip = else_close + 1
        cond = bool(eval(m.group(1)))  # digits/comparison ops only (_IF_RE)
        text = (text[: m.start()] + (then_body if cond else else_body)
                + rest[skip:])


def reference_tensor_map(loader: str) -> dict:
    """{file_tensor_name: ggml ne tuple} straight from the reference
    loader's source."""
    src = _strip_comments(
        open(os.path.join(REFERENCE, "main.cpp")).read())
    body = _fold_constants(_expand_loops(_function_body(src, loader)))

    events = []  # (pos, kind, payload) in source order, aliases applied
    for m in _ALIAS_RE.finditer(body):
        events.append((m.start(), "alias", (m.group(1), m.group(2))))
    for m in _DECL_RE.finditer(body):
        ne = tuple(_arith(a) for a in m.group(3).split(","))
        assert len(ne) == int(m.group(2))
        events.append((m.start(), "decl",
                       (re.sub(r"\s+", "", m.group(1)), ne)))
    for m in _TENSORS_RE.finditer(body):
        events.append((m.start(), "bind",
                       (m.group(1), re.sub(r"\s+", "", m.group(2)))))

    aliases, decls, out = {}, {}, {}
    for _, kind, payload in sorted(events):
        if kind == "alias":
            aliases[payload[0]] = payload[1]
        elif kind == "decl":
            lhs = payload[0]
            root = lhs.split(".", 1)[0].split("[", 1)[0]
            if root in aliases:
                lhs = aliases[root] + lhs[len(root):]
            decls[lhs] = payload[1]
        else:
            name_expr, rhs = payload
            assert re.fullmatch(r'(\s|\+|"[^"]*")+', name_expr), name_expr
            name = "".join(re.findall(r'"([^"]*)"', name_expr))
            root = rhs.split(".", 1)[0].split("[", 1)[0]
            if root in aliases:
                rhs = aliases[root] + rhs[len(root):]
            assert rhs in decls, f"{name}: undeclared member {rhs}"
            out[name] = decls[rhs]
    return out


def _np_shape(ne: tuple) -> tuple:
    """ggml ne -> numpy shape (io/ggml.py reading convention), with
    leading length-1 axes dropped for comparison (ggml omits trailing
    ne of 1)."""
    return _strip1(tuple(reversed(ne)))


def _strip1(shape: tuple) -> tuple:
    shape = tuple(shape)
    while len(shape) > 1 and shape[0] == 1:
        shape = shape[1:]
    return shape


def _assert_inventory_matches(ref_map: dict, inventory: dict) -> None:
    missing = sorted(set(ref_map) - set(inventory))
    extra = sorted(set(inventory) - set(ref_map))
    assert not missing and not extra, (
        f"missing from converter inventory: {missing[:10]}; "
        f"not in reference: {extra[:10]}")
    for name, ne in ref_map.items():
        assert _strip1(inventory[name]) == _np_shape(ne), (
            f"{name}: converter shape {inventory[name]} vs reference "
            f"ne {ne} (numpy {_np_shape(ne)})")


class _Tracking(dict):
    def __init__(self, base):
        super().__init__(base)
        self.used = set()

    def __getitem__(self, key):
        self.used.add(key)
        return super().__getitem__(key)


# --------------------------------------------------------------------------
# the three loaders
# --------------------------------------------------------------------------

def test_ar_inventory_matches_reference_loader():
    ref = reference_tensor_map("autoregressive_model_load")
    assert len(ref) == 10 + 30 * 12
    _assert_inventory_matches(ref, ar_tensor_inventory())


def test_diffusion_inventory_matches_reference_loader():
    ref = reference_tensor_map("diffusion_model_load")
    _assert_inventory_matches(ref, diffusion_tensor_inventory())


def test_vocoder_inventory_matches_reference_loader():
    ref = reference_tensor_map("vocoder_model_load")
    _assert_inventory_matches(ref, vocoder_tensor_inventory())


def test_converters_consume_every_reference_tensor():
    """Every tensor the reference loads must feed the param pytree (a
    field silently dropped by the converter would pass the inventory
    check but produce a model missing weights)."""
    for inv, build in (
        (ar_tensor_inventory(), ar_params_from_tensors),
        (diffusion_tensor_inventory(), diffusion_params_from_tensors),
        (vocoder_tensor_inventory(), vocoder_params_from_tensors),
    ):
        tensors = _Tracking(random_ggml_tensors(inv, seed=0, fast=True))
        build(tensors)
        unused = sorted(set(inv) - tensors.used)
        assert not unused, f"converter never read: {unused[:10]}"

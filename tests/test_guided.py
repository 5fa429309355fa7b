"""Guided decoding tests: regex DFA engine + end-to-end constrained
generation (reference: guided-decoding feature, xgrammar-backed)."""
import json

import numpy as np
import pytest

from tensorrt_llm_tpu.guided.grammar_matcher import (GrammarMatcher,
                                                     MatcherFactory,
                                                     TokenTable,
                                                     json_object_regex,
                                                     schema_to_regex)
from tensorrt_llm_tpu.guided.regex_dfa import compile_regex
from tensorrt_llm_tpu.sampling_params import GuidedDecodingParams


def match_full(dfa, s: str) -> bool:
    state = dfa.start
    for b in s.encode():
        state = int(dfa.table[state, b])
        if state < 0:
            return False
    return bool(dfa.accepting[state])


@pytest.mark.parametrize("pattern,ok,bad", [
    ("abc", ["abc"], ["ab", "abcd", "abd"]),
    ("a+b*", ["a", "aab", "abbb"], ["b", ""]),
    ("(foo|bar)+", ["foo", "barfoo"], ["fo", "foob"]),
    ("[a-c]{2,3}", ["ab", "abc"], ["a", "abcd", "ad"]),
    ("-?[0-9]+(\\.[0-9]+)?", ["-3", "3.14", "42"], ["-", "3.", ".5"]),
    ("a{3}", ["aaa"], ["aa", "aaaa"]),
    ("x{0,2}", ["", "x", "xx"], ["xxx"]),
])
def test_regex_dfa(pattern, ok, bad):
    dfa = compile_regex(pattern)
    for s in ok:
        assert match_full(dfa, s), f"{pattern} should match {s!r}"
    for s in bad:
        assert not match_full(dfa, s), f"{pattern} should reject {s!r}"


def test_json_object_regex_accepts_json():
    dfa = compile_regex(json_object_regex(depth=2))
    good = ['{}', '{"a": 1}', '{"a": "x", "b": [1, 2]}',
            '{"a": {"b": true}}']
    for s in good:
        assert match_full(dfa, s), s
    assert not match_full(dfa, '{"a": }')
    assert not match_full(dfa, '[1,2]')


def test_schema_to_regex():
    schema = {"type": "object",
              "properties": {"name": {"type": "string"},
                             "age": {"type": "integer"}},
              "required": ["name", "age"]}
    dfa = compile_regex(schema_to_regex(schema))
    assert match_full(dfa, '{"name": "bo", "age": 3}')
    assert not match_full(dfa, '{"age": 3, "name": "bo"}')  # order enforced
    assert not match_full(dfa, '{"name": "bo"}')


def simple_table():
    # vocab: one char per token + eos at 0
    chars = ["</s>", "a", "b", "c", "{", "}", '"', ":", "1", "2", " "]
    return TokenTable(chars, eos_token_id=0), chars


def test_matcher_masks_and_accepts():
    table, chars = simple_table()
    factory = MatcherFactory(table)
    m = factory.create(GuidedDecodingParams(regex="ab+c"))
    mask = m.fill_next_token_bitmask()
    assert mask[chars.index("a")] and not mask[chars.index("b")]
    assert m.accept_token(chars.index("a"))
    mask = m.fill_next_token_bitmask()
    assert mask[chars.index("b")] and not mask[chars.index("a")]
    assert m.accept_token(chars.index("b"))
    m2_state = m.state
    assert m.accept_token(chars.index("c"))
    mask = m.fill_next_token_bitmask()
    assert mask[table.eos_token_id]
    # rollback undoes the 'c'
    m.rollback(1)
    assert m.state == m2_state


def test_e2e_guided_regex():
    """Constrained generation over token-id-level guidance (no tokenizer:
    token i's byte string is str(i))."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    from tensorrt_llm_tpu import (LLM, GuidedDecodingParams, KvCacheConfig,
                                  SamplingParams)
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=32, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=1, num_attention_heads=2,
                      num_key_value_heads=2, max_position_embeddings=128)
    tmodel = LlamaForCausalLM(cfg).eval()
    llm = LLM(model=tmodel, skip_tokenizer_init=True, dtype="float32",
              max_batch_size=4, max_input_len=16, max_seq_len=64,
              max_num_tokens=64, guided_decoding_backend="dfa",
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=512))
    # constraint: token string must be "7" then "7"... regex (7)+ over
    # decimal token ids → only token id 7 allowed
    out = llm.generate([1, 2, 3], SamplingParams(
        max_tokens=4, top_k=1,
        guided_decoding=GuidedDecodingParams(regex="(7)+")))
    toks = out.outputs[0].token_ids
    # start state admits only "7"; accepting states also admit EOS (id 0)
    assert toks[0] == 7
    assert all(t in (0, 7) for t in toks)
    llm.shutdown()


def test_json_value_regex_accepts_scalars():
    from tensorrt_llm_tpu.guided.grammar_matcher import json_value_regex
    dfa = compile_regex(json_value_regex(depth=1))
    for s in ['1', '-3.5', 'true', 'null', '"hi"', '[1, 2]', '{"a": 1}']:
        assert match_full(dfa, s), s
    for s in ['truely', '01', '{a: 1}']:
        assert not match_full(dfa, s), s


def test_matcher_dead_end_allows_eos():
    table, chars = simple_table()
    m = MatcherFactory(table).create(GuidedDecodingParams(regex="ab"))
    assert m.accept_token(chars.index("a"))
    assert m.accept_token(chars.index("b"))
    mask = m.fill_next_token_bitmask()
    # pattern exhausted: only EOS admissible
    assert mask[table.eos_token_id]
    assert mask.sum() == 1


# --------------------------------------------------------------------- #
# EBNF grammars (bounded-expansion compiler; reference: xgrammar ebnf)
# --------------------------------------------------------------------- #
def test_ebnf_choice_grammar():
    from tensorrt_llm_tpu.guided.ebnf import ebnf_to_regex
    g = 'root ::= "yes" | "no" | "maybe"'
    dfa = compile_regex(ebnf_to_regex(g))
    for s in ("yes", "no", "maybe"):
        assert match_full(dfa, s), s
    for s in ("", "y", "yesno", "nope"):
        assert not match_full(dfa, s), s


def test_ebnf_rule_refs_and_repetition():
    from tensorrt_llm_tpu.guided.ebnf import ebnf_to_regex
    g = '''
    # a comma-separated word list
    root ::= word ("," ws word)*
    word ::= [a-z]+
    ws   ::= [ ]?
    '''
    dfa = compile_regex(ebnf_to_regex(g))
    for s in ("a", "foo,bar", "x, y, z"):
        assert match_full(dfa, s), s
    for s in ("", ",a", "a,", "A"):
        assert not match_full(dfa, s), s


def test_ebnf_bounded_recursion():
    from tensorrt_llm_tpu.guided.ebnf import ebnf_to_regex
    # nested parens: recursion depth capped, base case exists
    g = 'root ::= "()" | "(" root ")"'
    dfa = compile_regex(ebnf_to_regex(g, max_depth=4))
    for s in ("()", "(())", "((()))"):
        assert match_full(dfa, s), s
    assert not match_full(dfa, "(")
    # unbounded recursion without base case is rejected loudly
    with pytest.raises(ValueError, match="recursion"):
        ebnf_to_regex('root ::= "(" root ")"', max_depth=2)


def test_ebnf_via_matcher_factory():
    table, chars = simple_table()
    factory = MatcherFactory(table)
    m = factory.create(GuidedDecodingParams(grammar='root ::= "ab" | "c"'))
    mask = m.fill_next_token_bitmask()
    assert mask[chars.index("a")] and mask[chars.index("c")]
    assert not mask[chars.index("b")]
    assert m.accept_token(chars.index("a"))
    assert m.accept_token(chars.index("b"))
    assert m.fill_next_token_bitmask()[0]          # eos now legal


# --------------------------------------------------------------------- #
# Structural tags (reference: xgrammar structural_tag)
# --------------------------------------------------------------------- #
def test_structural_tag_dfa_semantics():
    from tensorrt_llm_tpu.guided.regex_dfa import build_structural_dfa
    dfa = build_structural_dfa([("<f>", "[0-9]+", "</f>")])
    assert match_full(dfa, "free text only")
    assert match_full(dfa, "x <f>123</f> y")
    assert match_full(dfa, "<f>1</f><f>2</f>")
    assert not match_full(dfa, "<f>abc</f>")       # content constrained
    assert not match_full(dfa, "<f>12")            # unterminated


def test_structural_tag_via_factory():
    table, chars = simple_table()
    factory = MatcherFactory(table)
    spec = {"structures": [
        {"begin": "{", "content_regex": "[12]+", "end": "}"}]}
    m = factory.create(GuidedDecodingParams(
        structural_tag=json.dumps(spec)))
    # free text: everything allowed (incl. eos)
    mask = m.fill_next_token_bitmask()
    assert mask[chars.index("a")] and mask[0]
    # entering the structure forces content
    assert m.accept_token(chars.index("{"))
    mask = m.fill_next_token_bitmask()
    assert mask[chars.index("1")] and mask[chars.index("2")]
    assert not mask[chars.index("a")] and not mask[0]
    assert m.accept_token(chars.index("1"))
    assert m.accept_token(chars.index("}"))
    assert m.fill_next_token_bitmask()[0]          # back to free text

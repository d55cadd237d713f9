"""Endpoint rules + n-gram relative cost."""

import math

from asr_streaming_tpu.streaming.endpoint import (
    EndpointRule, NgramEndpointCost, detect_endpointing, load_endpoint_rules,
    rule_activated, VI_DEFAULT_RULES,
)


def test_rule_activation():
    rule = EndpointRule(must_contain_nonsilence=True,
                        min_trailing_silence=1.0,
                        min_utterance_length=0.0,
                        max_relative_cost=math.inf)
    # pure silence: utterance_length == trailing -> no nonsilence
    assert not rule_activated(rule, trailing_silence=2.0,
                              utterance_length=2.0, relative_cost=0.0)
    assert rule_activated(rule, trailing_silence=1.0,
                          utterance_length=3.0, relative_cost=0.0)
    assert not rule_activated(rule, trailing_silence=0.9,
                              utterance_length=3.0, relative_cost=0.0)


def test_vi_default_rules_first_match():
    # 0.7 s silence + cheap LM continuation fires rule1.4
    ok, name = detect_endpointing(VI_DEFAULT_RULES, utterance_length=3.0,
                                  trailing_silence=0.7, relative_cost=1.5)
    assert ok and name == "rule1.4"
    # expensive continuation needs the full 1.0 s
    ok, name = detect_endpointing(VI_DEFAULT_RULES, utterance_length=3.0,
                                  trailing_silence=0.95, relative_cost=100)
    assert not ok
    ok, name = detect_endpointing(VI_DEFAULT_RULES, utterance_length=3.0,
                                  trailing_silence=1.0, relative_cost=100)
    assert ok and name == "rule1.1"
    # 40 s hard flush fires regardless of silence
    ok, name = detect_endpointing(VI_DEFAULT_RULES, utterance_length=40.0,
                                  trailing_silence=0.0, relative_cost=100)
    assert ok and name == "rule4"


def test_ngram_cost_backoff():
    cost = NgramEndpointCost(order=3, logprobs={
        "xin chào </s>": -0.2,
        "chào </s>": -0.5,
        "</s>": -2.0,
    })
    # full bigram context hit
    assert cost.relative_cost("xin chào") == -5.0 * -0.2
    # backoff: "rồi chào" -> "chào </s>"
    assert cost.relative_cost("rồi chào") == -5.0 * -0.5
    # full backoff to unigram </s>
    assert cost.relative_cost("mèo") == -5.0 * -2.0
    # empty LM -> large finite cost (cost-gated rules never fire, but
    # unconditional rules with max_relative_cost=inf still do)
    assert NgramEndpointCost().relative_cost("anything") == \
        NgramEndpointCost.NO_LM_COST


def test_arpa_loading(tmp_path):
    arpa = tmp_path / "lm.arpa"
    arpa.write_text("\\data\\\nngram 1=2\nngram 2=1\n\n\\1-grams:\n"
                    "-1.5\t</s>\n-0.3\thello\t-0.1\n\n\\2-grams:\n"
                    "-0.7\thello </s>\n\n\\end\\\n")
    cost = NgramEndpointCost.from_arpa(str(arpa))
    assert cost.order == 2
    assert cost.relative_cost("hello") == -5.0 * -0.7
    assert cost.relative_cost("xyz") == -5.0 * -1.5

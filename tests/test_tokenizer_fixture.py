"""Real-HF-tokenizer path, exercised offline via an in-repo vocab fixture.

VERDICT r3 next #7: the grounding positive-map construction must match the
reference's ``RobertaTokenizerFast`` span semantics
(sparse_featfusion_grounder.py:570-621) bit-for-bit once vocab files appear.
``tests/fixtures/roberta_tok`` holds a REAL byte-level-BPE vocab
(vocab.json/merges.txt over the full byte alphabet + word merges) and
``recorded.json`` — token ids and char_to_token tables produced by
``RobertaTokenizerFast`` on four grounding-style prompts at fixture-creation
time. The tests below (a) re-run the live fast tokenizer against the
recording (regression-pins HF behavior), and (b) check
``build_positive_maps`` against an independent re-implementation of the
reference's span->token expansion driven only by the COMMITTED tables.
"""

import json
import os

import numpy as np
import pytest

FIXDIR = os.path.join(os.path.dirname(__file__), 'fixtures', 'roberta_tok')


@pytest.fixture(scope='module')
def recorded():
    with open(os.path.join(FIXDIR, 'recorded.json')) as f:
        return json.load(f)


@pytest.fixture(scope='module')
def hf_tok(recorded):
    from embodiedscan_tpu.models.text import HFTokenizer
    tok = HFTokenizer(FIXDIR, max_len=recorded['max_len'])
    assert type(tok.tok).__name__ == 'RobertaTokenizerFast'
    return tok


class TestHFTokenizerAgainstRecording:

    def test_ids_and_mask_match(self, hf_tok, recorded):
        out = hf_tok(recorded['prompts'])
        np.testing.assert_array_equal(out['input_ids'],
                                      np.asarray(recorded['input_ids']))
        np.testing.assert_array_equal(out['attention_mask'],
                                      np.asarray(recorded['attention_mask']))

    def test_char_to_token_matches(self, hf_tok, recorded):
        hf_tok(recorded['prompts'])
        for i, table in enumerate(recorded['char_to_token']):
            got = [hf_tok.char_to_token(i, c) for c in range(len(table))]
            assert got == table, f'prompt {i}'

    def test_words_are_single_tokens(self, hf_tok, recorded):
        # the fixture vocab merges prompt words into single G-prefixed
        # tokens (roberta-base-like), so spans exercise multi-char tokens
        ids = hf_tok(recorded['prompts'])['input_ids']
        toks = hf_tok.tok.convert_ids_to_tokens(list(ids[0]))
        assert 'Ġred' in toks and 'Ġtable' in toks


def _reference_positive_map(c2t_table, spans, max_text_len):
    """Reference create_positive_map semantics from a recorded c2t table."""

    def c2t(c):
        if c < 0 or c >= len(c2t_table):
            return None
        return c2t_table[c]

    row = np.zeros(max_text_len, np.float32)
    for beg, end in spans:
        beg_pos = c2t(beg)
        end_pos = c2t(end - 1)
        if beg_pos is None:
            beg_pos = c2t(beg + 1)
            if beg_pos is None:
                beg_pos = c2t(beg + 2)
        if end_pos is None:
            end_pos = c2t(end - 2)
            if end_pos is None:
                end_pos = c2t(end - 3)
        if beg_pos is None or end_pos is None:
            continue
        row[beg_pos:end_pos + 1] = 1.0
    return row / (row.sum() + 1e-6)


class TestPositiveMaps:

    def test_build_positive_maps_matches_reference_semantics(
            self, hf_tok, recorded):
        from embodiedscan_tpu.models.text import build_positive_maps
        prompts = recorded['prompts']
        # spans chosen to exercise: word starts, spans starting ON the
        # space (beg+1 fallback), multi-word spans, and span at char 0
        spans = [
            [[[0, 3]], [[4, 13]]],            # 'the', 'red chair'
            [[[2, 12]], [[7, 31]]],           # 'small lamp', 'lamp on the desk'
            [[[5, 15]], [[29, 37]]],          # 'the pillow' (+span on space)
            [[[4, 11]], [[12, 28]]],          # 'cabinet', 'left of the door'
        ]
        max_len = recorded['max_len']
        out = hf_tok(prompts)
        assert out['input_ids'].shape == (4, max_len)
        maps = build_positive_maps(hf_tok, prompts, spans, max_len,
                                   max_boxes=2)
        assert maps.shape == (4, 2, max_len)
        for i in range(4):
            for j in range(2):
                exp = _reference_positive_map(recorded['char_to_token'][i],
                                              spans[i][j], max_len)
                np.testing.assert_allclose(maps[i, j], exp, atol=1e-7,
                                           err_msg=f'prompt {i} box {j}')
        # at least one map must be non-trivially multi-token normalized
        assert (maps.max(-1) < 0.6).any()
        assert maps.sum() > 0

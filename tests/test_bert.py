"""BERT encoder-only path: classification/reranking via LLM.classify
(reference: _torch/models/modeling_bert.py BertForSequenceClassification
served for reranking)."""
import numpy as np
import pytest


def test_bert_classify_matches_hf():
    import torch
    from transformers import BertConfig, BertForSequenceClassification
    from tensorrt_llm_tpu import LLM

    torch.manual_seed(0)
    cfg = BertConfig(vocab_size=96, hidden_size=64, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=128,
                     max_position_embeddings=128, num_labels=3)
    tmodel = BertForSequenceClassification(cfg).eval()
    llm = LLM(model=tmodel, skip_tokenizer_init=True, dtype="float32")
    prompts = [[2, 5, 9, 23], [7, 11, 13, 17, 19, 23]]
    mine = llm.classify(prompts)
    assert mine.shape == (2, 3)
    with torch.no_grad():
        for i, p in enumerate(prompts):
            ref = tmodel(input_ids=torch.tensor([p]),
                         attention_mask=torch.ones(1, len(p),
                                                   dtype=torch.long)
                         ).logits[0].numpy()
            np.testing.assert_allclose(mine[i], ref, rtol=2e-4, atol=2e-4)
    llm.shutdown()


def test_bert_token_types_and_padding():
    """Sentence-pair scoring (token_type_ids) with ragged batch rows."""
    import torch
    from transformers import BertConfig, BertForSequenceClassification
    from tensorrt_llm_tpu import LLM

    torch.manual_seed(1)
    cfg = BertConfig(vocab_size=96, hidden_size=64, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=128,
                     max_position_embeddings=128, num_labels=2)
    tmodel = BertForSequenceClassification(cfg).eval()
    llm = LLM(model=tmodel, skip_tokenizer_init=True, dtype="float32")
    prompts = [[2, 5, 9, 23, 40, 41], [7, 11, 13]]
    tts = [[0, 0, 0, 1, 1, 1], [0, 0, 1]]
    mine = llm.classify(prompts, token_type_ids=tts)
    with torch.no_grad():
        for i, (p, tt) in enumerate(zip(prompts, tts)):
            ref = tmodel(input_ids=torch.tensor([p]),
                         token_type_ids=torch.tensor([tt]),
                         attention_mask=torch.ones(1, len(p),
                                                   dtype=torch.long)
                         ).logits[0].numpy()
            np.testing.assert_allclose(mine[i], ref, rtol=2e-4, atol=2e-4)
    llm.shutdown()

"""Text analytics: tokenization, bags, embeddings, sentiment, HTML."""

import numpy as np

from helpers import fails, run_get


def test_tokenized_document():
    v = run_get('d = tokenizedDocument(["The cat sat." "Dogs bark!"]);'
                "j = joinWords(d); V = d.Vocabulary;", "j", "V")
    assert v["j"].data[0, 0] == "The cat sat ."
    assert "cat" in [s for s in v["V"].data.reshape(-1)]


def test_remove_words_families():
    v = run_get('d = tokenizedDocument("the big elephant ran quickly");'
                "a = joinWords(removeStopWords(d));"
                "b = joinWords(removeLongWords(d, 4));"
                "c = joinWords(removeShortWords(d, 4));"
                "e = joinWords(removeWords(d, \"elephant\"));",
                "a", "b", "c", "e")
    assert v["a"].data[0, 0] == "big elephant ran quickly"
    assert v["b"].data[0, 0] == "the big ran"
    assert v["c"].data[0, 0] == "elephant quickly"
    assert "elephant" not in v["e"].data[0, 0]


def test_normalize_token_details():
    v = run_get('d = tokenizedDocument("running dogs");'
                "n = joinWords(normalizeWords(d));"
                'd2 = addPartOfSpeechDetails(addSentenceDetails('
                'tokenizedDocument("He ran. She sat.")));'
                "t = tokenDetails(d2);", "n", "t")
    assert v["n"].data[0, 0] == "runn dog"
    tbl = v["t"]
    assert "Token" in tbl.varnames and "SentenceNumber" in tbl.varnames
    sent = tbl.cols[tbl.varnames.index("SentenceNumber")].host().reshape(-1)
    assert sent[0] == 1.0 and sent[-1] == 2.0


def test_bag_of_words_encode():
    v = run_get('docs = tokenizedDocument(["red red blue" "blue green"]);'
                "bag = bagOfWords(docs); C = bag.Counts; n = bag.NumWords;"
                'E = encode(bag, tokenizedDocument("red green"));',
                "C", "n", "E")
    assert v["n"].host()[0, 0] == 3.0
    assert v["C"].host().sum() == 5.0
    assert v["E"].host().sum() == 2.0


def test_bag_of_ngrams():
    v = run_get('b = bagOfNgrams(tokenizedDocument("a b c"));'
                "V = b.Vocabulary;", "V")
    grams = [s for s in v["V"].data.reshape(-1)]
    assert "a b" in grams and "b c" in grams


def test_word_encoding_sequence():
    v = run_get('enc = wordEncoding(tokenizedDocument("alpha beta gamma"));'
                'i = word2ind(enc, ["beta" "alpha"]);'
                "w = ind2word(enc, [3 1]);"
                'seq = doc2sequence(enc, tokenizedDocument("alpha gamma"));',
                "i", "w", "seq")
    assert v["i"].host().reshape(-1).tolist() == [2.0, 1.0]
    assert [s for s in v["w"].data.reshape(-1)] == ["gamma", "alpha"]
    assert v["seq"].data[0, 0].host().reshape(-1).tolist() == [1.0, 3.0]


def test_embedding_train_roundtrip(tmp_path):
    p = tmp_path / "emb.vec"
    src = ('docs = tokenizedDocument(["the king rules the land" '
           '"the queen rules the land" "dogs chase cats"]);'
           "emb = trainWordEmbedding(docs, 'Dimension', 8);"
           "v = word2vec(emb, \"king\"); d = emb.Dimension;"
           f"writeWordEmbedding(emb, '{p}');"
           f"emb2 = readWordEmbedding('{p}');"
           "v2 = word2vec(emb2, \"king\");"
           "ok = isVocabularyWord(emb, [\"king\" \"zebra\"]);"
           "w = vec2word(emb, v);")
    v = run_get(src, "v", "d", "v2", "ok", "w")
    assert v["d"].host()[0, 0] == 8.0
    assert np.allclose(v["v"].host(), v["v2"].host(), atol=1e-4)
    assert v["ok"].host().tolist() == [[True, False]]
    assert v["w"].item() == "king"


def test_cosine_similarity():
    v = run_get("s = cosineSimilarity([1 0; 0 1; 1 0]);", "s")
    s = v["s"].host()
    assert abs(s[0, 2] - 1.0) < 1e-9
    assert abs(s[0, 1]) < 1e-9


def test_vader():
    v = run_get('s = vaderSentimentScores(tokenizedDocument('
                '["this is great" "this is terrible" "not good"]));', "s")
    s = v["s"].host().reshape(-1)
    assert s[0] > 0.2
    assert s[1] < -0.2
    assert s[2] < 0.0    # negation flips 'good'


def test_html():
    src = ("h = htmlTree(['<html><body><p class=\"x\">Hello</p>'"
           " '<p>World</p><script>junk()</script></body></html>']);"
           "ps = findElement(h, 'p'); a = getAttribute(ps{1}, 'class');"
           "t = extractHTMLText(h);")
    v = run_get(src, "ps", "a", "t")
    assert v["ps"].size == 2
    assert v["a"].item() == "x"
    assert v["t"].item() == "Hello World"


def test_fasttext_unavailable():
    fails("e = fastTextWordEmbedding;", "SupportFileMissing")

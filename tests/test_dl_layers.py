"""Deep-learning layer API: constructors, dlnetwork, training."""

import numpy as np

from helpers import run_get


def test_layer_constructors():
    v = run_get("l1 = featureInputLayer(4); l2 = fullyConnectedLayer(8);"
                "l3 = reluLayer; l4 = softmaxLayer;"
                "L = lstmLayer(16, 'OutputMode', 'last');",
                "l1", "l2", "l3", "L")
    assert v["l1"].get_scalar_field("Type").to_str() == "featureInput"
    assert v["l2"].get_scalar_field("OutputSize").host()[0, 0] == 8.0
    assert v["L"].get_scalar_field("OutputMode").to_str() == "last"


def test_dlnetwork_predict():
    v = run_get("net = dlnetwork({featureInputLayer(3), fullyConnectedLayer(5),"
                "reluLayer, fullyConnectedLayer(2), softmaxLayer});"
                "y = predict(net, ones(3, 4)); s = sum(y, 1);", "y", "s")
    y = v["y"].host()
    assert y.shape == (2, 4)
    assert np.allclose(v["s"].host(), 1.0, atol=1e-6)   # softmax columns sum to 1


def test_forward_method_syntax():
    v = run_get("net = dlnetwork({featureInputLayer(2), fullyConnectedLayer(3)});"
                "a = net.predict([1; 2]); b = forward(net, [1; 2]);", "a", "b")
    assert np.allclose(v["a"].host(), v["b"].host())
    assert v["a"].shape == (3, 1)


def test_train_network_classification():
    src = (
        "rng(0);"
        "X = [randn(30, 2); randn(30, 2) + 4];"      # 60 obs x 2 features
        "Y = [ones(30, 1); 2 * ones(30, 1)];"
        "layers = {featureInputLayer(2), fullyConnectedLayer(16), reluLayer,"
        "          fullyConnectedLayer(2), softmaxLayer, classificationLayer};"
        "opts = trainingOptions('adam', 'MaxEpochs', 200, 'MiniBatchSize', 60,"
        "                       'InitialLearnRate', 0.01);"
        "net = trainNetwork(X, Y, layers, opts);"
        "p = predict(net, X');"
        "[~, cls] = max(p, [], 1);"
        "acc = mean(cls' == Y);")
    v = run_get(src, "acc")
    assert v["acc"].host()[0, 0] > 0.95


def test_train_regression():
    src = (
        "rng(1); X = linspace(-1, 1, 64)';"
        "Y = 2 * X + 0.5;"
        "layers = {featureInputLayer(1), fullyConnectedLayer(1), regressionLayer};"
        "opts = trainingOptions('adam', 'MaxEpochs', 300, 'MiniBatchSize', 64,"
        "                       'InitialLearnRate', 0.05);"
        "net = trainNetwork(X, Y, layers, opts);"
        "err = mean(abs(predict(net, X') - Y'));")
    v = run_get(src, "err")
    assert v["err"].host()[0, 0] < 0.05


def test_lstm_forward_shapes():
    v = run_get("net = dlnetwork({sequenceInputLayer(3), "
                "lstmLayer(8, 'OutputMode', 'last'), fullyConnectedLayer(2)});"
                "x = ones(3, 10, 4); y = predict(net, x);", "y")
    assert v["y"].shape == (2, 4)


def test_bilstm_conv1d_gap():
    v = run_get("net = dlnetwork({sequenceInputLayer(2), "
                "convolution1dLayer(3, 4), reluLayer, globalAveragePooling1dLayer,"
                "fullyConnectedLayer(1)});"
                "y = predict(net, ones(2, 8, 5));", "y")
    assert v["y"].shape == (1, 5)
    v2 = run_get("net = dlnetwork({sequenceInputLayer(2), "
                 "bilstmLayer(4, 'OutputMode', 'last'), fullyConnectedLayer(1)});"
                 "y = predict(net, ones(2, 6, 3));", "y")
    assert v2["y"].shape == (1, 3)


def test_analyze_padsequences():
    v = run_get("net = dlnetwork({featureInputLayer(2), fullyConnectedLayer(3)});"
                "info = analyzeNetwork(net);"
                "[P, M] = padsequences({[1 2 3], [4 5]}, 2);", "info", "P", "M")
    assert v["info"].get_scalar_field("TotalLearnables").host()[0, 0] == 9.0
    P = v["P"].host()
    assert P.shape == (1, 3, 2)
    assert P[0, :, 1].tolist() == [4.0, 5.0, 0.0]
    assert v["M"].host()[:, 1].tolist() == [True, True, False]

"""2-D CNN layer family (imageInput/conv2d/pool/batchnorm/flatten/gap2d):
forward shapes + end-to-end training (≙ deep_learning/layers.rs family,
redesigned so the whole forward and Adam step are single XLA programs)."""

import numpy as np

from helpers import run


def test_cnn_forward_shape():
    s = run("layers = {imageInputLayer([8 8 1]), "
            "convolution2dLayer(3, 4, 'Padding', 'same'), reluLayer, "
            "maxPooling2dLayer(2), flattenLayer, fullyConnectedLayer(5), "
            "softmaxLayer}; "
            "net = dlnetwork(layers); "
            "x = rand(8, 8, 1, 10); y = predict(net, x); sz = size(y); "
            "cs = sum(y, 1);")
    sz = s.get("sz").host().reshape(-1)
    assert sz.tolist() == [5.0, 10.0]
    np.testing.assert_allclose(s.get("cs").host().reshape(-1), 1.0,
                               rtol=1e-5)


def test_cnn_valid_conv_and_stride_shapes():
    s = run("layers = {imageInputLayer([12 12 2]), "
            "convolution2dLayer(3, 6), reluLayer, "
            "averagePooling2dLayer(2), batchNormalizationLayer, "
            "globalAveragePooling2dLayer, fullyConnectedLayer(3)}; "
            "net = dlnetwork(layers); "
            "y = predict(net, rand(12, 12, 2, 4)); sz = size(y);")
    # conv valid: 12->10, avgpool2: 10->5, gap -> (6 channels, 4 batch) ->
    # fc(3) -> (3, 4)
    assert s.get("sz").host().reshape(-1).tolist() == [3.0, 4.0]


def test_cnn_trains_bright_vs_dark():
    s = run("rng(3); n = 60; X = zeros(6, 6, 1, n); Y = zeros(1, n); "
            "for k = 1:n, bright = mod(k, 2); "
            "  X(:, :, 1, k) = rand(6) * 0.3 + bright * 0.7; "
            "  Y(k) = bright + 1; end; "
            "layers = {imageInputLayer([6 6 1]), "
            "convolution2dLayer(3, 2, 'Padding', 'same'), reluLayer, "
            "globalAveragePooling2dLayer, fullyConnectedLayer(2), "
            "softmaxLayer, classificationLayer}; "
            "opts = trainingOptions('adam', 'MaxEpochs', 40, "
            "'MiniBatchSize', 20); "
            "net = trainNetwork(X, Y, layers, opts); "
            "p = predict(net, X); [~, cls] = max(p, [], 1); "
            "acc = mean(cls == Y);")
    assert float(np.asarray(s.get("acc").host()).reshape(-1)[0]) >= 0.9

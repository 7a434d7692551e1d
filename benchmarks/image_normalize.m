% 4K frame-batch normalize pipeline (single precision).
% Same workload as the reference's benchmarks/4k-image-processing: per-frame
% mean/std normalize, gain/bias, clamp, gamma, then MSE reduction — one fused
% device pipeline over a B x H x W batch.
if ~exist('seed', 'var'), seed = 0; end
rng(seed);
if ~exist('B', 'var'), B = 16; end
if ~exist('H', 'var'), H = 2160; end
if ~exist('W', 'var'), W = 3840; end
gain = single(1.0123); bias = single(-0.02);
gamma0 = single(1.8); eps0 = single(1e-6);

imgs = rand(B, H, W, 'single');

mu = single(mean(imgs, [2 3], 'native'));
sigma = single(sqrt(mean((imgs - mu).^2, [2 3], 'native') + eps0));

out = single(((imgs - mu) ./ sigma) * gain + bias);
out = max(out, single(0));
out = single(out .^ gamma0);
err = out - imgs;
mse = gather(mean(err .* err, 'all'));
fprintf('RESULT_ok MSE=%.6e\n', double(mse));

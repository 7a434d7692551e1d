% Monte-Carlo GBM option pricing (single precision, Philox RNG).
% Same workload as the reference's benchmarks/monte-carlo-analysis (rng
% variant): T randn draws + fused exp update per step, then payoff reduction.
if ~exist('seed', 'var'), seed = 0; end
rng(seed);
if ~exist('M', 'var'), M = 1000000; end
if ~exist('T', 'var'), T = 256; end
S0 = single(100); mu = single(0.05); sigma = single(0.20);
dt = single(1.0 / 252.0); K = single(100.0);

S = ones(M, 1, 'single') * S0;
drift = (mu - 0.5 * sigma^2) * dt;
scale = sigma * sqrt(dt);

for t = 1:T
  Z = randn(M, 1, 'single');
  S = S .* exp(drift + scale .* Z);
end

payoff = max(S - K, 0);
price = mean(payoff, 'all') * exp(-mu * T * dt);
fprintf('RESULT_ok PRICE=%.6f\n', double(price));

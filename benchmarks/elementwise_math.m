% Fused elementwise chain benchmark (single precision).
% Same workload as the reference's benchmarks/elementwise-math: a sin/exp/
% cos/tanh/power chain over N points that must fuse into one device kernel.
if ~exist('points', 'var')
  points = 10000000;
end
points = floor(points);
x = single(linspace(0, 4 * pi, points));
y0 = sin(x) .* exp(-x / single(10));
y1 = y0 .* cos(x / 4) + single(0.25) .* (y0 .^ 2);
y2 = tanh(y1) + single(0.1) .* y1;
checksum = gather(sum(y2(1:1024)));
fprintf('RESULT_ok CHECK=%.6f\n', double(checksum));
